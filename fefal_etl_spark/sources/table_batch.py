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

One input partition per data file: Spark schedules files across
executors, each reading its parquet with pyarrow and yielding Arrow
record batches — columnar through the Python boundary, like the
streaming readers. At 100 TB the unit of parallelism is the file,
which is exactly how the manifest bounds work anyway.
"""

from __future__ import annotations

import os
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

from fefal_etl_spark.streaming.table_source import (
    _apply_column_ops_batch,
    _apply_column_ops_schema,
    _append_partition_columns,
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


def _arrow_type(simple: str):
    """Arrow type for a Spark simpleString, for the types the widening
    lattice covers (None = not mapped; keep the file's own type)."""
    import pyarrow as pa

    import re as _re

    flat = {
        "tinyint": pa.int8(),
        "smallint": pa.int16(),
        "int": pa.int32(),
        "bigint": pa.int64(),
        "float": pa.float32(),
        "double": pa.float64(),
    }
    if simple in flat:
        return flat[simple]
    m = _re.match(r"^decimal\((\d+),(\d+)\)$", simple or "")
    if m:
        return pa.decimal128(int(m.group(1)), int(m.group(2)))
    return None


def _scalar_arrow_type(simple: str):
    """Arrow type for the common non-numeric scalar simpleStrings
    (`_arrow_type` covers the widening-lattice numerics). None for
    complex types — the caller falls back to a footer search."""
    import pyarrow as pa

    return {
        "string": pa.string(),
        "boolean": pa.bool_(),
        "date": pa.date32(),
        # Spark TIMESTAMP (LTZ) round-trips as UTC-tagged micros;
        # TIMESTAMP_NTZ as tag-less micros
        "timestamp": pa.timestamp("us", tz="UTC"),
        "timestamp_ntz": pa.timestamp("us"),
        "binary": pa.binary(),
    }.get(simple)


def _find_column_type(root: str, files: list, name: str, ops: list):
    """Arrow type of ``name`` from the NEWEST file that physically
    carries it (complex-typed added columns only — the scalar maps
    answer everything else without IO). Added columns come from later
    commits, so the reversed scan usually stops at the first footer."""
    import pyarrow.parquet as pq

    for rel in reversed(files):
        sch = _apply_column_ops_schema(
            pq.ParquetFile(os.path.join(root, rel)).schema_arrow, ops
        )
        idx = sch.get_field_index(name)
        if idx >= 0:
            return sch.field(idx).type
    return None


def _snapshot_meta(root: str, version: int):
    """(state, pcols, col_ops, declared arrow schema) AS OF ``version``
    — the version-pinned twin of the streaming `_table_meta` +
    `_stream_schema_names` pair (those fix metadata at the LATEST
    version, which is right for a stream and wrong for time travel).

    The declared schema starts from the first data file, then two
    MANIFEST-schema corrections make it the true table schema:

    * a column the manifest records with a different (widened) numeric
      type is overridden to the manifest's type — after a type-widening
      append the first file may still hold the narrow physical bytes;
    * a column the manifest records that the first file LACKS (added
      by a later commit — schema evolution) is APPENDED, typed from
      the manifest record; files without it surface typed NULLs, the
      same contract as ``TransactionalTable.read()``'s union-by-name."""
    import pyarrow as pa
    import pyarrow.parquet as pq

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
    base = pq.ParquetFile(os.path.join(root, files[0])).schema_arrow
    base = _apply_column_ops_schema(base, ops)
    # the resolved manifest schema is already logical-named
    # (table._apply_record applies rename/drop ops to it)
    mf_schema = dict(state.get("schema") or {})
    for i, name in enumerate(base.names):
        want = _arrow_type(mf_schema.get(name, ""))
        if want is not None and want != base.field(i).type:
            base = base.set(i, pa.field(name, want))
    # add-column evolution: manifest columns absent from file 0
    for name, simple in mf_schema.items():
        if name in base.names or name in pcols:
            continue
        want = (
            _arrow_type(simple)
            or _scalar_arrow_type(simple)
            or _find_column_type(root, files, name, ops)
        )
        if want is not None:
            base = base.append(pa.field(name, want))
    for c in pcols:
        if c not in base.names:
            base = base.append(pa.field(c, pa.string()))
    return state, pcols, ops, base


def _project_batch(batch, target):
    """Project an Arrow batch onto the declared schema: reorder,
    fill columns the file lacks with typed NULLs (add-column
    evolution), and upcast narrow physical types (type widening)."""
    import pyarrow as pa

    if batch.schema == target:
        return batch
    cols = []
    for field in target:
        idx = batch.schema.get_field_index(field.name)
        if idx < 0:
            cols.append(pa.nulls(batch.num_rows, type=field.type))
            continue
        col = batch.column(idx)
        if col.type != field.type:
            col = col.cast(field.type)
        cols.append(col)
    return pa.RecordBatch.from_arrays(cols, schema=target)


class _BatchFilePartition(InputPartition):
    def __init__(
        self,
        path: str,
        rel: str,
        mask: list[int],
        pcols: list[str],
        col_ops: list,
        schema: "object",
    ):
        self.path = path
        self.rel = rel
        self.mask = mask  # THIS file's DV-masked row positions
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
        return [
            _BatchFilePartition(
                os.path.join(self.root, rel),
                rel,
                masks.get(rel) or [],
                self.pcols,
                self.col_ops,
                self.arrow_schema,
            )
            for rel in self.state["files"]
        ]

    def read(self, partition: _BatchFilePartition) -> Iterator:
        import pyarrow as pa
        import pyarrow.parquet as pq

        mask = set(partition.mask)
        target = partition.schema
        offset = 0
        for batch in pq.ParquetFile(partition.path).iter_batches():
            n = batch.num_rows
            if mask:
                idx = [i for i in range(n) if (offset + i) not in mask]
                offset += n
                if not idx:
                    continue
                if len(idx) < n:
                    batch = batch.take(pa.array(idx, type=pa.int32()))
            batch = _apply_column_ops_batch(batch, partition.col_ops)
            batch = _append_partition_columns(
                batch, partition.rel, partition.pcols
            )
            yield _project_batch(batch, target)


class TxnTableBatchDataSource(DataSource):
    """``spark.read.format("txn_table")`` over a
    `fefal_etl_spark.table.TransactionalTable` root, with
    ``version`` / ``asOfTimestamp`` time-travel options."""

    @classmethod
    def name(cls) -> str:
        return "txn_table"

    def _meta(self) -> tuple:
        """Resolve the snapshot ONCE per DataSource instance: schema()
        and reader() share it, so a commit landing between the two
        calls can never bind one version's batches to another
        version's declared schema (the streaming module shares
        `_table_meta` for the same reason)."""
        cached = getattr(self, "_meta_cache", None)
        if cached is None:
            root = self.options["path"]
            version = _resolve_version(root, self.options)
            cached = _snapshot_meta(root, version)
            self._meta_cache = cached
        return cached

    def schema(self):
        from pyspark.sql.pandas.types import from_arrow_schema

        return from_arrow_schema(self._meta()[3])

    def reader(self, schema) -> TxnTableBatchReader:
        return TxnTableBatchReader(self.options["path"], self._meta())
