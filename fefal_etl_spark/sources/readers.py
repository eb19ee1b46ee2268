"""Source readers (SURVEY.md §2.1 S1–S4).

The reference ingests one uploaded CSV/Excel file with pandas
(etl_ui.py:858-862) and reads PostgreSQL/Mongo for registry/config
(etl_ui.py:63-67, 130-145). Engine mapping:

- S1 CSV / parquet: native distributed scans (header→schema, pushdown).
- S2 Excel: no core Spark reader — a *driver-side pandas shim* gated on
  openpyxl, acceptable because survey xlsx files are KB–MB sized; never on
  the distributed path.
- S3 JDBC: ``spark.read.jdbc`` with predicate-partitioned parallel reads.
- S4 Mongo config: plain JSON (see plans.config.PipelineConfig.from_json);
  config is metadata, not a data-plane source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_csv(
    spark: SparkSession,
    path: str,
    header: bool = True,
    infer_schema: bool = False,
    all_strings: bool = True,
    **options,
) -> DataFrame:
    """S1 — survey CSV scan. The reference reads everything as strings and
    coerces later (etl_ui.py:863 ``df.astype(str)``); ``all_strings=True``
    reproduces that (the cleaning layer owns typing)."""
    reader = spark.read.option("header", header)
    if infer_schema and not all_strings:
        reader = reader.option("inferSchema", True)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_excel(spark: SparkSession, path: str, sheet_name=0) -> DataFrame:
    """S2 — Excel ingest via the pandas shim (driver-side; survey files are
    small by construction — ~10³ rows, SURVEY.md §6). Raises a clear error
    when openpyxl is unavailable (it is not bundled in this environment)."""
    try:
        import pandas as pd

        pdf = pd.read_excel(path, sheet_name=sheet_name)
    except ImportError as e:
        raise NotImplementedError(
            "Excel ingest needs openpyxl (not installed); convert the survey "
            "to CSV/parquet or install openpyxl"
        ) from e
    pdf = pdf.astype(str)  # reference parity: etl_ui.py:863
    return spark.createDataFrame(pdf)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **properties,
) -> DataFrame:
    """S3 — JDBC scan (registry/dim tables; etl_ui.py:88, 440, 603).

    With ``partition_column`` the read is split into ``num_partitions``
    range-parallel queries — required for any JDBC table beyond toy size.
    (Exercised in tests/test_jdbc_sources.py against embedded Derby.)
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", num_partitions)
            .option("lowerBound", lower_bound or 0)
            .option("upperBound", upper_bound or 1_000_000)
        )
    for k, v in properties.items():
        reader = reader.option(k, v)
    return reader.load()
