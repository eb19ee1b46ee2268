"""Declared-schema machinery shared by the Arrow-native table sources
(`sources/table_batch.py`, `streaming/table_source.py`).

A transactional table's TRUE schema lives in the manifest's column
record, not in any single parquet footer: a later commit may have ADDED
a column (files before it lack the bytes — schema evolution) or
WIDENED a column's type (files before it hold the narrow physical
type). The Python Data Source API declares ONE static schema and binds
Arrow batches to it, so both sources must (a) declare the manifest
union, and (b) project every file's batches onto it — reordering,
filling absent columns with typed NULLs, and upcasting narrow types.
That is exactly what `TransactionalTable.read()`'s union-by-name scan
does JVM-side; this module is the Arrow-side equivalent.
"""

from __future__ import annotations

import os
import re

_DECIMAL_RE = re.compile(r"^decimal\((\d+),(\d+)\)$")


def arrow_type_of(simple: str):
    """Arrow type for a Spark simpleString scalar (numerics + the
    common non-numeric scalars). None for complex/unknown types — the
    caller falls back to a footer search."""
    import pyarrow as pa

    flat = {
        "tinyint": pa.int8(),
        "smallint": pa.int16(),
        "int": pa.int32(),
        "bigint": pa.int64(),
        "float": pa.float32(),
        "double": pa.float64(),
        "string": pa.string(),
        "boolean": pa.bool_(),
        "date": pa.date32(),
        # Spark TIMESTAMP (LTZ) round-trips as UTC-tagged micros;
        # TIMESTAMP_NTZ as tag-less micros
        "timestamp": pa.timestamp("us", tz="UTC"),
        "timestamp_ntz": pa.timestamp("us"),
        "binary": pa.binary(),
    }
    if simple in flat:
        return flat[simple]
    m = _DECIMAL_RE.match(simple or "")
    if m:
        return pa.decimal128(int(m.group(1)), int(m.group(2)))
    return None


def find_column_type(root: str, files: list, name: str, apply_ops):
    """Arrow type of ``name`` from the NEWEST live file that physically
    carries it — a single reversed footer walk (ADVICE r7: the previous
    16-newest bound silently dropped a bool/date/decimal column whose
    only carriers are older live files, diverging from
    ``TransactionalTable.read()``'s union-by-name scan; correctness
    first). Added columns come from later commits, so the walk usually
    stops within the first few footers; only a column NO live file
    carries (a dead manifest-record name left by a narrowing rewrite —
    rare) pays the full O(live files) walk. ``apply_ops`` maps a raw
    footer schema to logical names."""
    import pyarrow.parquet as pq

    for rel in reversed(files):
        sch = apply_ops(
            pq.ParquetFile(os.path.join(root, rel)).schema_arrow
        )
        idx = sch.get_field_index(name)
        if idx >= 0:
            return sch.field(idx).type
    return None


def declared_schema(root: str, state: dict, pcols: list, apply_ops):
    """The snapshot's declared Arrow schema: the first data file's
    footer (column ops applied) is the ORDER baseline, then the
    manifest's column record corrects it — widened types override,
    columns absent from file 0 (added later) append — and hive
    partition columns append as strings (their on-disk path form)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    files = state["files"]
    base = apply_ops(
        pq.ParquetFile(os.path.join(root, files[0])).schema_arrow
    )
    mf_schema = dict(state.get("schema") or {})
    for i, name in enumerate(base.names):
        want = arrow_type_of(mf_schema.get(name, ""))
        if want is not None and want != base.field(i).type:
            base = base.set(i, pa.field(name, want))
    # columns PROVABLY carried by a live file, at zero IO: per-file
    # stats are keyed by the file's physical columns and pruned to
    # live files on every commit. The manifest schema record itself is
    # GROW-ONLY (a narrowing overwrite leaves dead names behind), so a
    # record entry alone must not declare a column —
    # TransactionalTable.read() would not surface it (review finding:
    # phantom all-NULL columns).
    live_cols: set[str] = set()
    for fs in (state.get("stats") or {}).values():
        # "__"-prefixed keys are the stats dict's reserved namespace
        # (__n_rows, __nulls), never data columns; since round 8 the
        # __nulls sub-map ALSO proves liveness — bool/date/timestamp
        # columns get no [min,max] entry but do get null counts, so
        # they resolve without any footer walk
        live_cols.update(k for k in fs if not k.startswith("__"))
        live_cols.update(fs.get("__nulls") or {})
    for name, simple in mf_schema.items():
        if name in base.names or name in pcols:
            continue
        if name in live_cols:
            want = arrow_type_of(simple) or find_column_type(
                root, files, name, apply_ops
            )
        else:
            # not stats-proven (no min/max, no null count): full footer
            # walk — newest first, so real carriers resolve fast and
            # only dead manifest-record names (narrowing-rewrite
            # leftovers, rare) pay the whole O(live files) scan; a
            # miss means dead — omit, matching read()
            want = find_column_type(root, files, name, apply_ops)
        if want is not None:
            base = base.append(pa.field(name, want))
    for c in pcols:
        if c not in base.names:
            base = base.append(pa.field(c, pa.string()))
    return base


def project_batch(batch, target):
    """Project an Arrow batch onto the declared schema: reorder, fill
    columns the file lacks with typed NULLs (add-column evolution),
    and upcast narrow physical types (type widening)."""
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
