"""Pipeline queries — registered into fefal_etl_spark.queries (filled in as the pipeline lands)."""
