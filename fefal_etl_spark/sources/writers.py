"""Sinks (SURVEY.md §2.1 S5–S7).

The reference loads with row-at-a-time ``INSERT … RETURNING``
(etl_ui.py:412-429) and exports multi-sheet Excel (etl_ui.py:2144-2159).
Engine mapping: bulk ``df.write`` everywhere; surrogate keys are generated
in-engine (operators.upsert) so no sink round-trips exist; Excel export is a
driver-side shim over ``toPandas`` for the small review workbooks only.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Parquet sink; partition by low-cardinality keys (e.g. ``ano``) so
    downstream scans prune whole directories."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", True).csv(path)


def write_star(
    star: dict[str, DataFrame], base_path: str, mode: str = "overwrite"
) -> dict[str, str]:
    """S5/S7 — persist a build_star output as one parquet dataset per table.
    Facts are written after dims so a failed run never leaves facts whose
    dim rows are missing. Returns table → path."""
    paths = {}
    ordered = sorted(star, key=lambda t: (not t.startswith("dim_"), t))
    for name in ordered:
        p = os.path.join(base_path, name)
        write_parquet(star[name], p, mode=mode)
        paths[name] = p
    return paths


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: pays the shuffle ONCE at write; afterwards
    every join/groupBy on ``bucket_cols`` between co-bucketed tables is
    exchange-free (verified by plan assertion in tests). The 100 TB answer
    for fact⋈fact joins that repeat every run."""
    spark = df.sparkSession
    if not spark.catalog.tableExists(table):
        # A managed-table location can outlive the (in-memory) catalog entry
        # across sessions; saveAsTable refuses to reuse it. Orphaned dir →
        # remove before writing.
        import shutil
        from pathlib import Path

        warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        loc = Path(warehouse.removeprefix("file:")) / table.lower()
        if loc.exists():
            shutil.rmtree(loc)
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def compact_parquet(
    spark, path: str, target_file_mb: int = 512, partition_cols: list[str] | None = None
) -> int:
    """Small-file compaction — the maintenance op every long-running 100 TB
    pipeline needs: streaming/incremental writes accumulate KB-sized files
    whose per-file open/footer cost eventually dominates scans. Rewrites
    ``path`` with file count sized from the data's actual bytes
    (``target_file_mb`` per output file), preserving an optional
    partitioning. Returns the number of output files requested.

    Rewrite goes through a temp sibling directory + atomic-ish rename so a
    crash never leaves ``path`` half-written (on object stores use a
    manifest/table format instead — rename is not atomic there).
    """
    import math
    import shutil
    from pathlib import Path

    df = spark.read.parquet(path)
    total_bytes = sum(
        f.stat().st_size for f in Path(path).rglob("*.parquet")
    )
    n_files = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))
    tmp = path.rstrip("/") + "__compacting"
    writer = df.repartition(n_files).write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)
    return n_files


def write_jdbc(
    df: DataFrame, url: str, table: str, mode: str = "append", **properties
) -> None:
    """S5 — bulk JDBC append (batched inserts per partition), replacing the
    reference's per-row INSERT loop. (Exercised in tests/test_jdbc_sources.py
    against embedded Derby.)"""
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in properties.items():
        writer = writer.option(k, v)
    writer.mode(mode).save()


def execute_jdbc(spark, url: str, sql: str, driver: str | None = None) -> None:
    """Execute one statement over ``java.sql`` through the Spark JVM
    gateway — used for the single set-based merge/DDL statement of the
    staged-upsert path (metadata-scale work; the row-scale work went
    through Spark's parallel JDBC writer)."""
    jvm = spark._jvm
    if driver:
        jvm.java.lang.Class.forName(driver)
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        try:
            st.executeUpdate(sql)
        finally:
            st.close()
    finally:
        conn.close()


def write_jdbc_upsert(
    df: DataFrame,
    url: str,
    target: str,
    keys: list[str],
    update_cols: list[str] | None = None,
    mode: str = "insert_ignore",
    staging_table: str | None = None,
    dialect=None,
    driver: str | None = None,
    keep_staging: bool = False,
    **properties,
) -> str:
    """S7 at scale — bulk-staged set-based upsert, replacing the
    reference's per-row psycopg2 ``INSERT … ON CONFLICT DO NOTHING`` loop
    (etl_ui.py:508-520):

    1. Spark's parallel JDBC writer bulk-loads ``df`` into a staging
       table (all executors write batched inserts concurrently);
    2. ONE dialect-built statement merges staging into ``target`` — the
       database executes it as a single relational operation
       (`sources/jdbc_dialects.py`: ``ON CONFLICT`` on Postgres, ANSI
       ``MERGE`` on Derby).

    ``mode``: ``insert_ignore`` (existing keys untouched — the
    reference's dim contract) or ``upsert`` (existing keys update
    ``update_cols``, default all non-key columns). Returns the executed
    merge SQL (callers/tests can log or golden-check it).

    The default staging name carries a UNIQUE suffix so concurrent
    upserts into the same target cannot overwrite each other's staged
    batch mid-merge, and the drop runs in a ``finally`` so a failed
    merge does not leak the staging table (pass ``staging_table`` to
    pin a name, ``keep_staging`` to inspect it)."""
    import uuid as _uuid

    from fefal_etl_spark.sources.jdbc_dialects import dialect_for_url

    d = dialect or dialect_for_url(url)
    staging = staging_table or f"{target}_stage_{_uuid.uuid4().hex[:8]}"
    write_jdbc(df, url, staging, mode="overwrite", driver=driver, **properties)
    spark = df.sparkSession
    try:
        cols = list(df.columns)
        if mode == "insert_ignore":
            sql = d.insert_ignore(target, staging, cols, keys)
        elif mode == "upsert":
            upd = update_cols or [c for c in cols if c not in keys]
            sql = d.upsert(target, staging, cols, keys, upd)
        else:
            raise ValueError(f"unknown upsert mode: {mode!r}")
        execute_jdbc(spark, url, sql, driver=driver)
    finally:
        if not keep_staging:
            try:
                execute_jdbc(
                    spark, url, f"DROP TABLE {staging}", driver=driver
                )
            except Exception:
                pass  # drop is cleanup — never mask the real error
    return sql


def write_excel_workbook(
    frames: dict[str, DataFrame], path: str, max_rows: int = 100_000
) -> None:
    """S6 — multi-sheet review workbook (valid/duplicates/unmatched/all;
    etl_ui.py:2144-2159). Driver-side by design: review exports are small.
    ``max_rows`` guards against accidentally collecting a big frame."""
    collected: dict[str, list[list[object]]] = {}
    for sheet, df in frames.items():
        rows = df.limit(max_rows + 1).collect()
        if len(rows) > max_rows:
            raise ValueError(
                f"sheet '{sheet}' exceeds max_rows={max_rows}; "
                "export parquet/CSV instead"
            )
        collected[sheet[:31]] = [list(df.columns)] + [list(r) for r in rows]
    try:
        import pandas as pd

        with pd.ExcelWriter(path) as xw:
            for sheet, grid in collected.items():
                pd.DataFrame(grid[1:], columns=grid[0]).to_excel(
                    xw, sheet_name=sheet, index=False
                )
    except ImportError:
        # dependency-free fallback: stdlib zip+XML serializer
        from fefal_etl_spark.sources.xlsx_minimal import write_workbook

        write_workbook(path, collected)


def write_excel_dir(
    df: DataFrame,
    path: str,
    partition_col: str,
    sheet_name: str = "data",
    max_rows_per_file: int = 100_000,
) -> DataFrame:
    """S6 at scale — DISTRIBUTED Excel export: one workbook per
    ``partition_col`` value, serialized ON THE EXECUTORS by the
    dependency-free zip+XML writer (sources.xlsx_minimal) inside a
    grouped ``applyInPandas``. The dual of :func:`readers.read_excel_dir`:
    N groups parallelize N-wide and no workbook's rows ever pass through
    the driver (the driver-side :func:`write_excel_workbook` stays the
    right tool for small multi-sheet review exports).

    Returns the written manifest (partition, path, n_rows) — a real
    DataFrame, so the export is lazily planned and the manifest is the
    action. ``path`` must be on storage every executor can reach (local
    FS in local mode, a shared mount/DFS on a cluster). Partition values
    are sanitized into filenames; ``max_rows_per_file`` fails a group
    loudly rather than silently producing a workbook Excel can't open
    (the format caps at 1,048,576 rows).
    """
    import os
    import re

    os.makedirs(path, exist_ok=True)
    cols = df.columns

    def _write(key, pdf):
        import os

        import pandas as pd

        from fefal_etl_spark.sources.xlsx_minimal import write_workbook

        val = str(key[0])
        if len(pdf) > max_rows_per_file:
            raise ValueError(
                f"partition {val!r} has {len(pdf)} rows > "
                f"max_rows_per_file={max_rows_per_file}"
            )
        safe = re.sub(r"[^A-Za-z0-9_.-]", "_", val) or "_"
        fp = os.path.join(path, f"{safe}.xlsx")
        grid = [list(cols)] + [
            ["" if v is None else str(v) for v in row]
            for row in pdf[cols].itertuples(index=False, name=None)
        ]
        write_workbook(fp, {sheet_name: grid})
        return pd.DataFrame(
            [{"partition": val, "path": fp, "n_rows": len(pdf)}]
        )

    return df.groupBy(partition_col).applyInPandas(
        _write, "partition string, path string, n_rows long"
    )
