"""fefal_etl_spark — a PySpark-native analytics/ETL engine.

A from-scratch Spark reimplementation of the query and data-processing
capabilities of the reference repo FranciscoR13/FEFAL-ETL (a pandas/Streamlit
survey-ETL pipeline; see SURVEY.md), re-expressed as a library of composable,
lazily-evaluated DataFrame transforms designed for 100 TB scale:

- ``fefal_etl_spark.functions``  — scalar column-expression factories
  (normalization, encodings, coercions; SURVEY.md §2.9)
- ``fefal_etl_spark.operators`` — relational operators (entity-resolution
  joins, window dedup, unpivot/reshape, dim upsert; SURVEY.md §2.2–2.8)
- ``fefal_etl_spark.plans``     — pipeline assembly (PipelineConfig,
  run_pipeline, build_star; SURVEY.md §3)
- ``fefal_etl_spark.llm``       — LLM-data-pipeline extensions (dedup at
  scale, similarity search, text analysis, multimodal; SURVEY.md §2.12)
- ``fefal_etl_spark.streaming`` — Structured Streaming layer (SURVEY.md §2.11)
- ``fefal_etl_spark.sources``   — readers/sinks (SURVEY.md §2.1)

Everything is stock DataFrame API: declarative plans that Catalyst/Tungsten
optimize (predicate pushdown, broadcast joins, whole-stage codegen, AQE).
No RDDs, no driver-side row loops, no Python UDFs in hot paths.
"""

__version__ = "0.1.0"

from fefal_etl_spark.session import get_spark  # noqa: F401
from fefal_etl_spark.datasets import load_table, load_tables  # noqa: F401
