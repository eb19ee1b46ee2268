"""WRITE half of the ``txn_table`` DataSource — batch
``df.write.format("txn_table")`` (VERDICT r7 item 5) and STREAMING
``df.writeStream.format("txn_table")`` (round-8 extension), completing
the read/write × batch/stream matrix over a transactional table
(writes previously required the `TransactionalTable` helper object or
the ``foreachBatch`` helper, which block pure-DataFrame users).

Usage::

    spark.dataSource.register(TxnTableBatchDataSource)
    df.write.format("txn_table").mode("append").save(root)
    df.write.format("txn_table").mode("overwrite").save(root)
    (df.write.format("txn_table").mode("append")
       .option("txnAppId", "job-7").option("txnVersion", 42)
       .save(root))                       # exactly-once via the ledger
    (stream_df.writeStream.format("txn_table")
       .option("path", root).option("txnAppId", "my-query")
       .option("checkpointLocation", ckpt)
       .start())                          # one atomic commit per batch

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

Hive layout: ``.option("partitionBy", "col[,col2]")`` (round-8
extension) makes each task split its batches columnar-side per
partition combo and write hive ``col=value/`` files — partition values
land in the manifest (pruning immediately live), partition columns are
dropped from file content and reconstructed on read, interoperable
with `stage_files`' own layout. Appends must match the table's
existing layout exactly (mixed layouts are rejected loudly — they
would degrade partition-overwrite semantics). Tables with GENERATED
partition columns stay rejected: deriving the transform needs Spark,
and layout-less files would silently break hidden partitioning.

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
    DataSourceStreamArrowWriter,
    WriterCommitMessage,
)


@dataclass
class _TaskFiles(WriterCommitMessage):
    files: list = field(default_factory=list)  # root-relative paths


def _hive_dir(pcols: list, str_arrays: list, row: int) -> str:
    """The hive path segment(s) for one partition combo, matching
    Spark's writer conventions so `stage_files`-written and
    sink-written layouts interoperate: values percent-escaped (Spark
    unescapes on read, `_partition_values` unquotes), NULL →
    ``__HIVE_DEFAULT_PARTITION__``, booleans lowercased (pyarrow's
    string cast already lowercases)."""
    from urllib.parse import quote

    segs = []
    for c, arr in zip(pcols, str_arrays):
        v = arr[row].as_py()
        seg_v = (
            "__HIVE_DEFAULT_PARTITION__"
            if v is None
            else quote(v, safe="")
        )
        segs.append(f"{quote(c, safe='')}={seg_v}")
    return "/".join(segs)


def _check_partition_types(schema, pcols: list) -> None:
    """Partition columns the sink accepts: types whose pyarrow string
    cast renders EXACTLY like Spark's hive writer and the manifest's
    `hive_partition_value` normalizer (review finding: pyarrow casts
    1.0 → '1' and timestamps with trailing microseconds, so a
    float/timestamp-partitioned sink write would record values Spark's
    layout and read_partition probes never match — rows silently
    pruned). Loud beats wrong: everything else routes to the helper
    API, whose Spark writer renders canonically."""
    import pyarrow.types as pt

    for c in pcols:
        f = schema.field(c)
        t = f.type
        ok = (
            pt.is_string(t)
            or pt.is_large_string(t)
            or pt.is_integer(t)
            or pt.is_boolean(t)
            or pt.is_date(t)
        )
        if not ok:
            raise ValueError(
                f"txn_table sink: partitionBy column {c!r} has type "
                f"{t} — only string/integer/boolean/date partition "
                "columns render identically across pyarrow, Spark's "
                "hive writer, and the manifest normalizer; use "
                "TransactionalTable.append(partition_by=...) for "
                "other types"
            )


def _stage_task_batches(
    root: str, commit_dir: str, iterator, pcols: list | None = None
) -> _TaskFiles:
    """Executor half shared by the batch and STREAMING sinks: stream
    this task's Arrow batches into immutable parquet files under
    ``data/<commit_dir>/`` (exactly `stage_files`' layout — invisible
    to readers until a manifest references it). Without ``pcols`` one
    file per non-empty task; with ``pcols`` (the ``partitionBy``
    option) each batch is SPLIT columnar-side by the partition combo
    and appended to one file per combo under hive ``col=value/``
    segments — partition columns dropped from the file content, like
    Spark's partitioned writer, and reconstructed from the path on
    read. Dependency-light: pyarrow + stdlib only (it is cloudpickled
    to workers)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    writers: dict[str, tuple] = {}  # hive dir ("" = layout-less) -> (writer, rel)

    def _writer_for(hive: str, schema) -> tuple:
        got = writers.get(hive)
        if got is None:
            d = os.path.join(root, "data", commit_dir, *filter(None, [hive]))
            os.makedirs(d, exist_ok=True)
            name = f"part-{uuid.uuid4().hex}.parquet"
            rel = "/".join(filter(None, ["data", commit_dir, hive, name]))
            got = (pq.ParquetWriter(os.path.join(d, name), schema), rel)
            writers[hive] = got
        return got

    try:
        for batch in iterator:
            if batch.num_rows == 0:
                continue
            if not pcols:
                _writer_for("", batch.schema)[0].write_batch(batch)
                continue
            missing = [c for c in pcols if c not in batch.schema.names]
            if missing:
                raise ValueError(
                    f"txn_table sink: partitionBy column(s) {missing} "
                    "not in the written DataFrame"
                )
            data_cols = [c for c in batch.schema.names if c not in pcols]
            if not data_cols:
                raise ValueError(
                    "txn_table sink: cannot use ALL columns as "
                    "partition columns"
                )
            _check_partition_types(batch.schema, pcols)
            # columnar split, COLLISION-FREE (review finding: a joined
            # string key merged combos whose values contained the
            # separator): dictionary-encode each partition column
            # independently (null → its own reserved code), stack the
            # per-column codes and group via np.unique over code ROWS —
            # no mixed-radix key, so no int64 overflow however many
            # partition columns / distinct values a batch carries
            # (advice r8: a radix product past 2^63 wrapped silently,
            # merging distinct combos into one hive dir)
            import numpy as np

            strs = [
                pc.cast(batch.column(c), pa.string()) for c in pcols
            ]
            codes = np.empty(
                (batch.num_rows, len(strs)), dtype=np.int64
            )
            for j, s in enumerate(strs):
                enc = pc.dictionary_encode(s)
                idx = pc.fill_null(enc.indices, len(enc.dictionary))
                codes[:, j] = idx.to_numpy(zero_copy_only=False)
            _, inverse = np.unique(
                codes, axis=0, return_inverse=True
            )
            inverse = inverse.reshape(-1)  # numpy 2.0 shape quirk
            for g in np.unique(inverse):
                mask = pa.array(inverse == g)
                sub = batch.filter(mask)
                if sub.num_rows == 0:
                    continue
                hive = _hive_dir(
                    pcols, [s.filter(mask) for s in strs], 0
                )
                w, _rel = _writer_for(
                    hive, sub.select(data_cols).schema
                )
                w.write_batch(sub.select(data_cols))
    finally:
        for w, _rel in writers.values():
            w.close()
    return _TaskFiles(files=sorted(rel for _w, rel in writers.values()))


def _parse_partition_by(options) -> list | None:
    """The ``partitionBy`` option (comma-separated column names) for
    hive-laid sink writes — the 100 TB ingest shape (time-partitioned
    facts). Option keys arrive lowercased from Spark."""
    raw = options.get("partitionby")
    if not raw:
        return None
    cols = [c.strip() for c in str(raw).split(",") if c.strip()]
    return cols or None


def _drop_staged(root: str, messages) -> None:
    """Staged files are invisible without a manifest — removal is
    best-effort hygiene, never correctness."""
    for m in messages:
        for rel in (m.files if m is not None else []):
            try:
                os.unlink(os.path.join(root, rel))
            except OSError:
                pass


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
        self.pcols = _parse_partition_by(options)

    # ------------------------------------------------------------ tasks
    def write(self, iterator: Iterator) -> _TaskFiles:
        return _stage_task_batches(
            self.root, self.commit_dir, iterator, self.pcols
        )

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
                    # hive_partitioning: partitionBy-staged files carry
                    # their partition columns in the PATH, not the
                    # content — a CHECK referencing one must still bind
                    # (review finding); layout-less paths are unaffected
                    n = con.execute(
                        f"SELECT count(*) FROM read_parquet([{files_sql}], "
                        f"hive_partitioning = true) "
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
        files = sorted(
            f for m in messages if m is not None for f in m.files
        )
        landed = _publish_staged(
            self.root,
            files,
            self.overwrite,
            self.schema_simple,
            self.txn,
            op="overwrite" if self.overwrite else "append",
            validate=self._validate_constraints,
            pcols=self.pcols,
        )
        if landed is None:
            # ledger-skipped replay: the staged files will never be
            # referenced — clean them up like abort() (review
            # finding: repeated replays otherwise accumulate
            # invisible data files until a manual vacuum)
            self.abort(messages)

    def abort(self, messages: List[Optional[_TaskFiles]]) -> None:
        _drop_staged(self.root, messages)


def _publish_staged(
    root: str,
    files: list,
    overwrite: bool,
    schema_simple: dict,
    txn,
    op: str,
    validate,
    pcols: list | None = None,
) -> int | None:
    """Driver half shared by the batch and STREAMING sinks: one
    manifest commit per job / micro-batch through the same CAS loop as
    the helper API, with the helper's full commit-time governance
    (generated/hive-layout rejection, retired names + type widening,
    CHECK constraints over the staged rows). Runs in a sessionless
    data source worker: TransactionalTable's metadata paths (manifest
    read, CAS publish, footer stats) never touch Spark. Returns the
    committed version, or None when the txn ledger already covered
    this (app_id, version) — the caller then drops the staged files."""
    from fefal_etl_spark.table import TransactionalTable

    t = TransactionalTable(None, root)
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
        # mixed-layout appends are rejected (review finding): a later
        # overwrite_partition must treat a layout-mismatched file as
        # possibly-in-target, so allowing one here would quietly
        # degrade the table's partition-overwrite semantics. The sink
        # writes the table's OWN layout when .option("partitionBy",
        # ...) names exactly the table's partition columns;
        # mode("overwrite") redefines the layout wholesale, which is
        # well-defined — allowed.
        # a DECLARED spec (round-9 partition evolution) is the layout
        # contract for new data; legacy tables infer from the file map
        table_pcols = (
            sorted(mf.partition_spec)
            if mf.partition_spec is not None
            else sorted(
                {c for pv in (mf.partitions or {}).values() for c in pv}
            )
        )
        if not overwrite and (mf.files or mf.partition_spec is not None):
            if sorted(pcols or []) != table_pcols:
                raise ValueError(
                    "txn_table sink: table partition layout is "
                    f"{table_pcols or 'layout-less'} but the write "
                    f"declares partitionBy={sorted(pcols or []) or None}"
                    " — mixed layouts degrade partition-overwrite "
                    "semantics; match the table's layout or use "
                    "TransactionalTable.append(partition_by=...)"
                )
        # same commit-time governance as the helper API: retired
        # names + type widening from the declared schema...
        t._check_schema(schema_simple, mf)
        # ...and CHECK constraints over the staged rows
        if mf.constraints and files:
            validate(
                mf.constraints,
                [os.path.join(root, f) for f in files],
            )
    if overwrite:
        return t._commit(
            files,
            op,
            base,
            rebase_ok=False,
            stats=t._file_stats(files),
            schema=dict(schema_simple),
            txn=txn,
        )
    return t._commit(
        files,
        op,
        base,
        rebase_ok=True,
        carry_parent_files=True,
        stats=t._file_stats(files),
        schema=dict(schema_simple),
        txn=txn,
    )


class TxnTableStreamWriter(DataSourceStreamArrowWriter):
    """STREAMING write half of the ``txn_table`` DataSource —
    ``df.writeStream.format("txn_table")`` (round-8 extension: the last
    cell of the read/write × batch/stream matrix; reads got batch in
    r7 and streaming in r5, writes got batch in r8 — streaming writes
    previously required the ``foreachBatch`` helper
    `streaming/events.py::transactional_table_sink`).

    Every micro-batch commits as ONE atomic manifest (op
    ``stream-append``, the same name `append_txn` uses), so readers see
    whole batches or nothing and every batch is time-travelable.
    Exactly-once: the manifest ledger keys on (``txnAppId``, batchId) —
    a crash between sink-commit and checkpoint-commit replays the
    batch, the ledger sees it is already covered, the commit is skipped
    and the staged files dropped (at-least-once replay, exactly-once
    landed rows — Delta's txnAppId/txnVersion protocol, here for the
    epoch/batch id Spark hands ``commit``).

    ``txnAppId`` is REQUIRED (no default): the Python DataSource API
    does not expose the query id, and two different streams sharing a
    default app id would poison each other's ledger entries (stream B
    restarting from batch 0 would be "already covered" by stream A's
    batch 5) — silent data loss, so the sink refuses to guess.

    ``outputMode("append")`` maps to ledgered stream-appends; complete
    mode (``overwrite=True``) replaces the table snapshot each batch
    under the same ledger. ``.option("partitionBy", ...)`` writes hive
    layout exactly like the batch sink (appends must match the table's
    existing layout; generated-partition tables stay rejected loudly);
    concurrent writers are safe — the commit CAS rebases appends and
    re-checks the ledger on every retry."""

    def __init__(self, root: str, schema, overwrite: bool, options):
        self.root = root
        self.overwrite = overwrite
        self.schema_simple = {
            f.name: f.dataType.simpleString() for f in schema.fields
        }
        app_id = options.get("txnappid")
        if not app_id:
            raise ValueError(
                "txn_table streaming sink requires .option('txnAppId', "
                "<unique-per-query id>): the ledger keys exactly-once "
                "on it, and a shared default would let two streams "
                "skip each other's batches"
            )
        self.app_id = app_id
        self.pcols = _parse_partition_by(options)

    # executor half — identical staging to the batch sink, but with a
    # FRESH data/<uuid>/ dir per task invocation (review finding: one
    # query-lifetime dir meant vacuum — which reclaims whole dirs —
    # could never delete compacted-away batch files while the stream
    # ran: the shared dir always held the newest live batch, so disk
    # grew with total ingested bytes; per-invocation dirs die with
    # their batch)
    def write(self, iterator: Iterator) -> _TaskFiles:
        return _stage_task_batches(
            self.root, uuid.uuid4().hex, iterator, self.pcols
        )

    # driver half — one ledgered commit per micro-batch
    def commit(
        self, messages: List[Optional[_TaskFiles]], batchId: int
    ) -> None:
        files = sorted(
            f for m in messages if m is not None for f in m.files
        )
        landed = _publish_staged(
            self.root,
            files,
            self.overwrite,
            self.schema_simple,
            (self.app_id, batchId),
            op="overwrite" if self.overwrite else "stream-append",
            validate=TxnTableArrowWriter._validate_constraints,
            pcols=self.pcols,
        )
        if landed is None:
            _drop_staged(self.root, messages)  # ledger-skipped replay

    def abort(
        self, messages: List[Optional[_TaskFiles]], batchId: int
    ) -> None:
        _drop_staged(self.root, messages)
