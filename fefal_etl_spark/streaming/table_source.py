"""Structured-Streaming SOURCE over a transactional table — the read-side
twin of `streaming/events.py::transactional_table_sink`.

Spark 4's Python Data Source API (`pyspark.sql.datasource`, SPARK-44076)
lets a pure-Python source participate in real micro-batch planning. Here
the OFFSET IS THE MANIFEST VERSION: each micro-batch covers the data
files ADDED by manifest versions (start, end], so

* a batch is exactly one-or-more atomic commits — readers never see a
  torn commit (the sink's guarantee carries through);
* offsets are deterministic: replaying (start, end] always yields the
  same files, so a checkpointed downstream sink gets end-to-end
  exactly-once without any source-side state;
* tailing cost is O(new files) — the incremental-consumption shape that
  makes a 100 TB table followable (the manifest diff is metadata-only).

Append-only contract (same as Delta's table-streaming default): a commit
that REMOVES files (CoW delete/merge/compact/zorder) is not expressible
as an append stream — ``partitions()`` raises unless
``ignoreChanges=true``, which skips removals and streams only additions
(Delta's ignoreChanges). Deletion-vector commits add no files and are
treated as changes (masked rows were already streamed). Unpartitioned
commits only (the txn streaming sink writes unpartitioned); hive-layout
tables need partition-value reconstruction that a follow-up could add.

Executors read the parquet files with pyarrow and yield Arrow batches —
the data plane stays columnar through the Python boundary.

Usage::

    spark.dataSource.register(TxnTableStreamDataSource)
    df = (spark.readStream.format("txn_table_stream")
          .option("path", table_root).load())
"""

from __future__ import annotations

import json
import os
import re
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

_MANIFEST_RE = re.compile(r"^manifest-(\d+)\.json$")


def _versions(root: str) -> list[int]:
    mdir = os.path.join(root, "_manifests")
    out = []
    for fn in os.listdir(mdir):
        m = _MANIFEST_RE.match(fn)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def _manifest(root: str, version: int) -> dict:
    with open(os.path.join(root, "_manifests", f"manifest-{version}.json")) as f:
        return json.load(f)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class TxnTableStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.root = options["path"]
        self.ignore_changes = (
            str(options.get("ignorechanges", "false")).lower() == "true"
        )
        # -1 = "nothing consumed"; startingVersion=N streams from N on
        self.start_version = int(options.get("startingversion", 0)) - 1

    # offsets are {"version": <last fully consumed manifest version>}
    def initialOffset(self) -> dict:
        return {"version": self.start_version}

    def latestOffset(self) -> dict:
        vs = _versions(self.root)
        return {"version": vs[-1] if vs else self.start_version}

    def partitions(
        self, start: dict, end: dict
    ) -> Sequence[InputPartition]:
        v0, v1 = start["version"], end["version"]
        if v1 <= v0:
            return []
        prev = set(_manifest(self.root, v0)["files"]) if v0 >= 0 else set()
        added: list[str] = []
        for v in range(v0 + 1, v1 + 1):
            cur = _manifest(self.root, v)
            cur_files = set(cur["files"])
            removed = prev - cur_files
            if removed and not self.ignore_changes:
                raise RuntimeError(
                    f"version {v} ({cur.get('op')}) removed "
                    f"{len(removed)} file(s); an append-only stream "
                    "cannot express rewrites — restart from a fresh "
                    "checkpoint or set ignoreChanges=true to stream "
                    "additions only"
                )
            added.extend(f for f in cur["files"] if f not in prev)
            prev = cur_files
        return [
            _FilePartition(os.path.join(self.root, f)) for f in added
        ]

    def read(self, partition: _FilePartition) -> Iterator:
        import pyarrow.parquet as pq

        # yield Arrow batches: the Python source stays columnar —
        # no per-row Python objects on the data plane
        for batch in pq.ParquetFile(partition.path).iter_batches():
            yield batch

    def commit(self, end: dict) -> None:
        # offsets are derived purely from immutable manifests — nothing
        # to persist source-side (the checkpoint holds the offset)
        pass


class TxnTableStreamDataSource(DataSource):
    """``spark.readStream.format("txn_table_stream")`` over a
    `fefal_etl_spark.table.TransactionalTable` root."""

    @classmethod
    def name(cls) -> str:
        return "txn_table_stream"

    def schema(self):
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import from_arrow_schema

        root = self.options["path"]
        vs = _versions(root)
        if not vs:
            raise FileNotFoundError(f"no committed version in {root}")
        files = _manifest(root, vs[-1])["files"]
        if not files:
            raise FileNotFoundError(f"latest version of {root} is empty")
        pa_schema = pq.ParquetFile(os.path.join(root, files[0])).schema_arrow
        return from_arrow_schema(pa_schema)

    def streamReader(self, schema) -> TxnTableStreamReader:
        return TxnTableStreamReader(self.options)
