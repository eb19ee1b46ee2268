"""LLM-pipeline queries — registered into fefal_etl_spark.queries (filled in as operators land)."""
