"""Idempotent dimension upsert + surrogate keys (SURVEY.md §2.1 S7, §3 EP3).

The reference assigns surrogate keys via per-row ``INSERT … RETURNING``
round-trips (etl_ui.py:412-429, 446-456) — a single-node sequential
bottleneck. The engine generates keys *inside Spark* so every bridge fact can
join on them without a driver round-trip:

- **hash keys** (default): ``xxhash64`` of the natural key — deterministic,
  shuffle-free, stable across runs/partitionings; collisions over a 64-bit
  space are negligible at dim cardinalities (birthday bound ≈ 2^32 rows).
- **dense sequential keys**: offset + ``row_number`` over the natural key —
  matches the reference's serial ids; needs one tiny shuffle of the *new*
  dim rows only (never the facts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hash_key(*cols) -> "F.Column":
    return F.xxhash64(*cols)


def _anti_join_null_safe(new: DataFrame, existing: DataFrame, keys: list[str]) -> DataFrame:
    """left_anti on natural keys, treating NULL == NULL: a plain equi anti
    join never matches NULL-keyed rows, so an idempotent re-load would
    re-insert them with fresh ids (dims with nullable key parts, e.g. the
    availability dim's id_tipo_disp)."""
    ex = existing.select(*keys)
    cond = None
    for k in keys:
        c = new[k].eqNullSafe(ex[k])
        cond = c if cond is None else cond & c
    return new.join(ex, on=cond, how="left_anti")


def upsert_dim_hash(
    existing: DataFrame | None,
    incoming: DataFrame,
    natural_key: str | list[str],
    id_col: str,
) -> DataFrame:
    """Merge new natural keys into a dim with hash surrogate ids.

    ``existing`` may be None (first load). Idempotent: re-running with the
    same input yields the same dim (same ids).
    """
    keys = [natural_key] if isinstance(natural_key, str) else list(natural_key)
    new = incoming.select(*keys).dropDuplicates(keys)
    if existing is not None:
        new = _anti_join_null_safe(new, existing, keys)
    new = new.withColumn(id_col, hash_key(*[F.col(k) for k in keys]))
    if existing is None:
        return new.select(id_col, *keys)
    return existing.select(id_col, *keys).unionByName(new.select(id_col, *keys))


def upsert_dim_sequential(
    existing: DataFrame | None,
    incoming: DataFrame,
    natural_key: str | list[str],
    id_col: str,
) -> DataFrame:
    """Merge new natural keys with dense sequential ids continuing after the
    existing max (reference ``INSERT RETURNING`` parity, etl_ui.py:446-456).

    Only the *new, distinct* dim rows pass through the row_number window —
    dims are small by definition, so the single-partition window is safe.
    """
    keys = [natural_key] if isinstance(natural_key, str) else list(natural_key)
    new = incoming.select(*keys).dropDuplicates(keys)
    if existing is not None:
        new = _anti_join_null_safe(new, existing, keys)
        offset_df = existing.agg(F.coalesce(F.max(id_col), F.lit(0)).alias("__off"))
    else:
        offset_df = None
    w = Window.orderBy(*keys)
    new = new.withColumn(id_col, F.row_number().over(w).cast("long"))
    if offset_df is not None:
        new = new.crossJoin(F.broadcast(offset_df)).withColumn(
            id_col, (F.col(id_col) + F.col("__off")).cast("long")
        ).drop("__off")
        return existing.select(id_col, *keys).unionByName(new.select(id_col, *keys))
    return new.select(id_col, *keys)


def scd2_merge(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    load_ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    is_current: str = "is_current",
    check_unique: bool = True,
) -> DataFrame:
    """Slowly-changing-dimension type-2 merge, pure DataFrame algebra.

    PRECONDITION: ``updates`` must have UNIQUE NON-NULL keys — it is a
    snapshot (one truth per key), not a changelog. NULL-keyed update rows
    identify no entity and are IGNORED by the merge (the full-outer
    equality join routes them nowhere); the uniqueness guard accordingly
    exempts them. A duplicate key would fan out the
    full-outer join: the same open row lands in ``closed_now`` twice and
    two conflicting open versions appear, silently corrupting the
    dimension (ADVICE r2). With ``check_unique`` (default) a runtime guard
    rides the merge itself — a per-key count is woven into the join key
    expression via ``assert_true``, so a duplicate fails the job loudly
    instead of corrupting, at the cost of one window pass over the
    (small, snapshot-sized) updates side; disable only when uniqueness is
    enforced upstream (e.g. the snapshot is itself a groupBy output).

    ``current`` carries (key, tracked..., valid_from, valid_to, is_current);
    ``updates`` is the new snapshot (key, tracked...). Result:

    - rows whose tracked attributes changed are *closed* (valid_to =
      load_ts, is_current = false) and a new open version is appended;
    - brand-new keys get an open row; unchanged/expired rows pass through.

    Change detection is null-safe (``eqNullSafe``), so NULL→value and
    value→NULL both version. Idempotent: re-merging the same snapshot is a
    no-op (nothing differs, nothing new).

    Scale: one key-hashed join between the open slice and the snapshot +
    unions — the history slice streams through untouched. On a real lake
    this feeds a partition-overwrite or MERGE INTO sink; the transform
    itself is engine-pure and testable.
    """
    if not tracked:
        raise ValueError("scd2_merge requires at least one tracked column")
    open_rows = current.filter(F.col(is_current))
    closed_rows = current.filter(~F.col(is_current))
    ts = F.lit(load_ts).cast("timestamp_ntz")

    upd = updates.select(
        F.col(key).alias("__k"), *[F.col(c).alias(f"__u_{c}") for c in tracked]
    )
    if check_unique:
        from pyspark.sql.window import Window

        n_per_key = F.count(F.lit(1)).over(Window.partitionBy("__k"))
        # NULL keys are exempt: the equality join never matches them anyway
        # (each NULL-key row opens independently — the nullable-dim-key case
        # _anti_join_null_safe exists for), and the window would otherwise
        # lump every NULL into one "duplicate" partition and fail merges
        # that used to work.
        guard = F.assert_true(
            (n_per_key == 1) | F.col("__k").isNull(),
            F.concat(
                F.lit("scd2_merge: duplicate key in updates snapshot: "),
                F.col("__k").cast("string"),
            ),
        )
        # woven into the join key so column pruning can't drop the check
        upd = upd.select(
            F.when(guard.isNull(), F.col("__k")).alias("__k"),
            *[F.col(f"__u_{c}") for c in tracked],
        )
    joined = open_rows.join(upd, open_rows[key] == F.col("__k"), "full_outer")

    same = None
    for c in tracked:
        eq = F.col(c).eqNullSafe(F.col(f"__u_{c}"))
        same = eq if same is None else (same & eq)

    dim_cols = [key, *tracked, valid_from, valid_to, is_current]

    # open rows with no change (or keys absent from the snapshot): pass through
    unchanged = joined.filter(
        F.col(key).isNotNull() & (F.col("__k").isNull() | same)
    ).select(*dim_cols)
    # open rows whose attributes changed: close them at load_ts
    closed_now = (
        joined.filter(F.col(key).isNotNull() & F.col("__k").isNotNull() & ~same)
        .select(*dim_cols)
        .withColumn(valid_to, ts)
        .withColumn(is_current, F.lit(False))
    )
    # changed keys + brand-new keys: open a fresh version
    opened = (
        joined.filter(F.col("__k").isNotNull() & (F.col(key).isNull() | ~same))
        .select(
            F.col("__k").alias(key),
            *[F.col(f"__u_{c}").alias(c) for c in tracked],
        )
        .withColumn(valid_from, ts)
        .withColumn(valid_to, F.lit(None).cast("timestamp_ntz"))
        .withColumn(is_current, F.lit(True))
    )
    return (
        closed_rows.select(*dim_cols)
        .unionByName(unchanged)
        .unionByName(closed_now)
        .unionByName(opened)
    )


def apply_changelog(
    changes: DataFrame,
    key: str,
    seq_cols: list[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """CDC changelog → current snapshot: keep each key's LATEST event (by
    ``seq_cols`` — commit timestamp, LSN, (ts, seq) pair, …) and drop keys
    whose latest event is a delete. The companion to :func:`scd2_merge`:
    SCD2 consumes snapshots and keeps history; this consumes an event
    stream and produces the snapshot.

    ``seq_cols`` must totally order each key's events (ties would make
    "latest" nondeterministic — add a sequence/LSN column as tiebreak,
    exactly what real CDC feeds carry).

    Scale: one key-hashed shuffle for the ranking window; no self-join, no
    driver state. Per-key event counts are usually small; a pathologically
    hot key is an AQE-skew concern like any window. Works incrementally:
    union yesterday's snapshot (as synthetic upserts at sequence −∞) with
    today's changes and re-apply.
    """
    w = Window.partitionBy(key).orderBy(*[F.col(c).desc() for c in seq_cols])
    return (
        changes.withColumn("__rk", F.row_number().over(w))
        .filter((F.col("__rk") == 1) & (F.col(op_col) != delete_op))
        .drop("__rk")
    )


def merge_aggregates(
    prev: DataFrame,
    delta: DataFrame,
    keys: list[str],
    merge_fns: dict[str, str],
) -> DataFrame:
    """Incremental aggregate maintenance: combine yesterday's aggregate
    table with a freshly-aggregated delta batch WITHOUT rescanning
    history — the pattern that turns an O(history) nightly rollup into an
    O(delta) one. ``merge_fns`` maps each aggregate column to its merge
    semigroup: ``sum`` (also merges counts), ``min``, ``max``. Averages
    and ratios must be stored as (sum, count) pairs and derived on read —
    they do not merge (flagged loudly rather than silently mis-merged).

    union + re-aggregate rather than a full-outer join: one shuffle on
    the group keys either way, but the union form needs no NULL-coalesce
    per column, handles keys present on either side symmetrically, and
    keeps map-side partial aggregation. At 100 TB the shuffle moves ≤
    |prev keys| + |delta keys| aggregate rows, never raw history.
    """
    allowed = {"sum", "min", "max"}
    bad = {c: f for c, f in merge_fns.items() if f not in allowed}
    if bad:
        raise ValueError(
            f"non-mergeable aggregate columns {bad}: store avg/ratio as "
            f"(sum, count) and derive on read"
        )
    both = prev.select(*keys, *merge_fns).unionByName(
        delta.select(*keys, *merge_fns)
    )
    aggs = [getattr(F, fn)(c).alias(c) for c, fn in merge_fns.items()]
    return both.groupBy(*keys).agg(*aggs)


def dim_as_of(
    dim: DataFrame,
    ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Point-in-time read over an SCD2 dimension: the version of each key
    that was valid at ``ts`` (``valid_from <= ts < valid_to``, open rows
    have NULL ``valid_to``). The time-travel query that makes SCD2 history
    worth storing — joins facts to the dimension AS OF the fact's own
    date instead of today's attributes.

    A narrow filter: predicate pushdown carries it into the dimension
    scan, and on a lake partitioned/Z-ordered by validity range it prunes
    files. Exactly one version per key survives by SCD2's non-overlap
    invariant (enforced at merge time, not re-checked here).
    """
    t = F.lit(ts).cast(dim.schema[valid_from].dataType)
    return dim.filter(
        (F.col(valid_from) <= t)
        & (F.col(valid_to).isNull() | (t < F.col(valid_to)))
    )


def merge_into(
    target: DataFrame,
    source: DataFrame,
    on: list[str],
    update_cols: list[str] | None = None,
    delete_condition=None,
    insert: bool = True,
    check_unique: bool = True,
) -> DataFrame:
    """General MERGE INTO (the Delta/Iceberg/ANSI lakehouse primitive) as
    pure DataFrame algebra over schema-aligned frames:

    - matched + ``delete_condition`` (a Column over the SOURCE schema,
      evaluated before the join) → row removed;
    - matched otherwise → target row with ``update_cols`` taken from the
      source (the WHEN MATCHED THEN UPDATE SET clause; default: every
      non-key column);
    - source-only keys → inserted (WHEN NOT MATCHED THEN INSERT), gated by
      ``insert``;
    - target-only rows stream through untouched.

    PRECONDITION (guarded like :func:`scd2_merge`): source keys are UNIQUE
    — a duplicate would fan the join out and write two conflicting
    versions of one row. With ``check_unique`` an ``assert_true`` window
    guard rides the source side and fails loudly.

    Scale: ONE full-outer key-hashed join — the merge never touches rows
    twice, never collects, and the target side streams through the join
    partition-parallel. On a real lake this is the transform behind a
    partition-overwrite or copy-on-write commit; at 100 TB pair it with
    partition pruning so only affected partitions re-write (the
    read-side twin of Delta's dynamic file skipping).
    """
    keys = list(on)
    upd = update_cols if update_cols is not None else [
        c for c in target.columns if c not in keys
    ]
    missing = [c for c in upd if c not in source.columns]
    if missing:
        raise ValueError(f"update_cols not in source: {missing}")

    src = source
    if check_unique:
        from pyspark.sql.window import Window

        n_per_key = F.count(F.lit(1)).over(Window.partitionBy(*keys))
        guard = F.assert_true(
            n_per_key == 1, F.lit("merge_into: duplicate key in source")
        )
        # woven into the first join key so column pruning can't drop it
        # (a withColumn+drop guard is pruned away — scd2_merge lesson)
        k0 = keys[0]
        src = src.select(
            F.when(guard.isNull(), F.col(k0)).alias(k0),
            *[c for c in source.columns if c != k0],
        )

    t = target.select(
        *[F.col(k).alias(f"__tk_{k}") for k in keys],
        *[F.col(c).alias(f"__t_{c}") for c in target.columns if c not in keys],
        F.lit(True).alias("__in_t"),
    )
    # delete_condition is evaluated against SOURCE columns before the join
    # (the caller writes it over the source schema, not join-internal names)
    del_flag = (
        delete_condition if delete_condition is not None else F.lit(False)
    )
    s = src.select(
        *[F.col(k).alias(f"__sk_{k}") for k in keys],
        *[F.col(c).alias(f"__s_{c}") for c in source.columns if c not in keys],
        del_flag.alias("__del"),
        F.lit(True).alias("__in_s"),
    )
    cond = None
    for k in keys:
        eq = F.col(f"__tk_{k}") == F.col(f"__sk_{k}")
        cond = eq if cond is None else (cond & eq)
    joined = t.join(s, cond, "full_outer")
    in_t = F.col("__in_t").isNotNull()
    in_s = F.col("__in_s").isNotNull()

    if delete_condition is not None:
        joined = joined.filter(
            ~(in_t & in_s & F.coalesce(F.col("__del"), F.lit(False)))
        )
    if not insert:
        joined = joined.filter(in_t)

    out_cols = []
    for k in keys:
        out_cols.append(
            F.coalesce(F.col(f"__tk_{k}"), F.col(f"__sk_{k}")).alias(k)
        )
    for c in target.columns:
        if c in keys:
            continue
        if c in upd and c in source.columns:
            # matched → source value; target-only → target; source-only → source
            v = F.when(in_s, F.col(f"__s_{c}")).otherwise(F.col(f"__t_{c}"))
        elif c in source.columns:
            # not updated on match, but needed for inserts
            v = F.when(in_t, F.col(f"__t_{c}")).otherwise(F.col(f"__s_{c}"))
        else:
            v = F.col(f"__t_{c}")
        out_cols.append(v.alias(c))
    return joined.select(*out_cols)
