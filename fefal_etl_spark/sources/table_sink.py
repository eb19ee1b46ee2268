"""Batch WRITE DataSource over a transactional table —
``df.write.format("txn_table")`` (VERDICT r7 item 5: API symmetry with
the r7 batch READ source in `sources/table_batch.py`; writes previously
required the `TransactionalTable.append()/overwrite()` helper object,
which blocks pure-DataFrame users).

Usage::

    spark.dataSource.register(TxnTableBatchDataSource)
    df.write.format("txn_table").mode("append").save(root)
    df.write.format("txn_table").mode("overwrite").save(root)
    (df.write.format("txn_table").mode("append")
       .option("txnAppId", "job-7").option("txnVersion", 42)
       .save(root))                       # exactly-once via the ledger

Semantics map 1:1 onto the commit protocol (`table.TransactionalTable`):

* every task streams its Arrow batches to ONE immutable parquet file
  under a fresh ``data/<uuid>/`` staging dir chosen on the driver —
  exactly `stage_files`' layout, invisible to readers until commit;
* the driver-side ``commit()`` publishes one manifest through the same
  CAS loop (appends rebase over concurrent commits, overwrite raises
  ``CommitConflict`` on a lost race), records per-file footer stats for
  data skipping, enforces schema evolution/widening and CHECK
  constraints exactly like the helper API, and honors the
  ``txnAppId``/``txnVersion`` idempotence ledger;
* a failed job calls ``abort()``, which removes the staged files — and
  even without it, staged-but-unpublished files are invisible by
  construction (the manifest IS the table).

Not supported through the sink (use the helper API): hive
``partition_by`` layout and tables with GENERATED partition columns —
the sink writes layout-less files, which would silently break hidden
partitioning, so such tables are rejected loudly.

Reference parity: the reference (FEFAL-ETL ``etl_ui.py:412-429``) loads
row-wise into Postgres; this module exists for the engine's lakehouse
extension surface.
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass, field
from typing import Iterator, List, Optional

from pyspark.sql.datasource import (
    DataSourceArrowWriter,
    WriterCommitMessage,
)


@dataclass
class _TaskFiles(WriterCommitMessage):
    files: list = field(default_factory=list)  # root-relative paths


class TxnTableArrowWriter(DataSourceArrowWriter):
    """One parquet file per non-empty task, one manifest commit per
    job. The executor half (`write`) is dependency-light (pyarrow +
    stdlib only — it is cloudpickled to workers); all protocol logic
    stays driver-side in `commit`/`abort`."""

    def __init__(self, root: str, schema, overwrite: bool, options):
        self.root = root
        self.overwrite = overwrite
        # the staging commit dir is chosen ONCE on the driver so all
        # task files land under a single data/<uuid>/ like stage_files
        self.commit_dir = uuid.uuid4().hex
        # the DECLARED write schema (Spark wrote the batches with it):
        # column -> simpleString, for manifest schema enforcement
        self.schema_simple = {
            f.name: f.dataType.simpleString() for f in schema.fields
        }
        app_id = options.get("txnappid")
        txn_version = options.get("txnversion")
        self.txn = (
            (app_id, int(txn_version))
            if app_id is not None and txn_version is not None
            else None
        )

    # ------------------------------------------------------------ tasks
    def write(self, iterator: Iterator) -> _TaskFiles:
        import pyarrow.parquet as pq

        writer = None
        rel = None
        try:
            for batch in iterator:
                if batch.num_rows == 0:
                    continue
                if writer is None:
                    d = os.path.join(self.root, "data", self.commit_dir)
                    os.makedirs(d, exist_ok=True)
                    name = f"part-{uuid.uuid4().hex}.parquet"
                    rel = f"data/{self.commit_dir}/{name}"
                    writer = pq.ParquetWriter(
                        os.path.join(d, name), batch.schema
                    )
                writer.write_batch(batch)
        finally:
            if writer is not None:
                writer.close()
        return _TaskFiles(files=[rel] if rel else [])

    @staticmethod
    def _validate_constraints(constraints: list, paths: list) -> None:
        """CHECK-constraint validation over the staged parquet files
        WITHOUT Spark: ``commit()`` runs in a sessionless Python data
        source worker (no JVM handle), so the staged rows are validated
        with DuckDB — same semantics as the helper API's
        `_check_constraints` (a row violates only when the expression
        is strictly FALSE; NULL passes). A constraint DuckDB cannot
        evaluate fails the write loudly rather than committing
        unvalidated rows."""
        import duckdb

        from fefal_etl_spark.table import ConstraintViolation

        files_sql = ", ".join(
            "'" + p.replace("'", "''") + "'" for p in paths
        )
        con = duckdb.connect()
        try:
            for c in constraints:
                try:
                    n = con.execute(
                        f"SELECT count(*) FROM read_parquet([{files_sql}]) "
                        f"WHERE NOT coalesce(({c}), TRUE)"
                    ).fetchone()[0]
                except ConstraintViolation:
                    raise
                except Exception as e:
                    raise ValueError(
                        f"txn_table sink cannot validate CHECK ({c}) "
                        f"outside Spark: {e}; use "
                        "TransactionalTable.append()/overwrite()"
                    ) from e
                if n:
                    raise ConstraintViolation(
                        f"write violates a CHECK constraint ({c}): "
                        f"{n} staged row(s) fail it"
                    )
        finally:
            con.close()

    # ----------------------------------------------------------- driver
    def commit(self, messages: List[Optional[_TaskFiles]]) -> None:
        from fefal_etl_spark.table import TransactionalTable

        files = sorted(
            f for m in messages if m is not None for f in m.files
        )
        # commit() runs in a sessionless worker: TransactionalTable's
        # metadata paths (manifest read, CAS publish, footer stats)
        # never touch Spark
        t = TransactionalTable(None, self.root)
        base = t.latest_version()
        if base is not None:
            mf = t._read_manifest(base)
            if mf.generated:
                raise ValueError(
                    "txn_table sink: table declares GENERATED partition "
                    f"columns {sorted(mf.generated)} — layout-less sink "
                    "files would break hidden partitioning; use "
                    "TransactionalTable.append()/overwrite()"
                )
            # appending layout-less files into a HIVE-partitioned table
            # is rejected too (review finding): a later
            # overwrite_partition must treat a mixed layout-less file
            # as possibly-in-target, so allowing it here would quietly
            # degrade the table's partition-overwrite semantics.
            # mode("overwrite") replaces the whole table with a
            # layout-less one, which is well-defined — allowed.
            if not self.overwrite and mf.partitions:
                raise ValueError(
                    "txn_table sink: table is hive-partitioned "
                    f"({sorted({c for pv in mf.partitions.values() for c in pv})}) "
                    "— the sink writes layout-less files; use "
                    "TransactionalTable.append(partition_by=...)"
                )
            # same commit-time governance as the helper API: retired
            # names + type widening from the declared schema...
            t._check_schema(self.schema_simple, mf)
            # ...and CHECK constraints over the staged rows
            if mf.constraints and files:
                self._validate_constraints(
                    mf.constraints,
                    [os.path.join(self.root, f) for f in files],
                )
        if self.overwrite:
            t._commit(
                files,
                "overwrite",
                base,
                rebase_ok=False,
                stats=t._file_stats(files),
                schema=dict(self.schema_simple),
                txn=self.txn,
            )
        else:
            landed = t._commit(
                files,
                "append",
                base,
                rebase_ok=True,
                carry_parent_files=True,
                stats=t._file_stats(files),
                schema=dict(self.schema_simple),
                txn=self.txn,
            )
            if landed is None:
                # ledger-skipped replay: the staged files will never be
                # referenced — clean them up like abort() (review
                # finding: repeated replays otherwise accumulate
                # invisible data files until a manual vacuum)
                self.abort(messages)

    def abort(self, messages: List[Optional[_TaskFiles]]) -> None:
        # staged files are invisible without a manifest — removal is
        # best-effort hygiene, never correctness
        for m in messages:
            for rel in (m.files if m is not None else []):
                try:
                    os.unlink(os.path.join(self.root, rel))
                except OSError:
                    pass
