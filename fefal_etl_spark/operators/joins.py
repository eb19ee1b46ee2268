"""Join operators (SURVEY.md §2.3 J1–J5).

The reference implements all joins as Python dict lookups (broadcast hash
left-outer joins in disguise). Here they are declarative DataFrame joins with
explicit ``broadcast()`` hints on the dimension side — at 100 TB the fact
side streams through map tasks with zero shuffle while the KB–MB-sized dims
ship once per executor.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from fefal_etl_spark.functions.text import (
    entity_key,
    normalize_text,
    remove_entity_prefixes,
)


def resolve_entities(
    survey: DataFrame,
    registry: DataFrame,
    name_col: str = "nome_entidade",
    type_col: str = "tipo_entidade",
    registry_name: str = "ent_nome",
    registry_type: str = "ent_tipo",
    registry_id: str = "id_entidades",
    out_id: str = "id_entidade",
) -> DataFrame:
    """J1 — entity-resolution broadcast left join (etl_ui.py:86-95).

    Both sides build the composite key ``norm(prefix_stripped(name)) || '||'
    || norm(type)``; misses yield NULL ``id_entidade`` (the "unmatched"
    branch). The registry (~thousands of rows) is broadcast.

    Duplicate keys on the registry side would fan out survey rows (a dict
    would keep the last); callers should dedup the registry first — the
    reference's registry has unique keys by construction.
    """
    reg = registry.select(
        F.col(registry_id).alias(out_id),
        entity_key(
            remove_entity_prefixes(F.col(registry_name)),
            normalize_text(F.col(registry_type)),
        ).alias("__entity_key"),
    ).dropDuplicates(["__entity_key"])
    keyed = survey.withColumn(
        "__entity_key",
        entity_key(
            remove_entity_prefixes(F.col(name_col)), normalize_text(F.col(type_col))
        ),
    )
    return keyed.join(F.broadcast(reg), on="__entity_key", how="left").drop(
        "__entity_key"
    )


def lookup_dim(
    facts: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    dim_id: str,
    how: str = "left",
) -> DataFrame:
    """J2 — dimension-key lookup join after unpivot (etl_ui.py:437-464 etc.).

    Equality join on a normalized name; dim side broadcast.
    """
    dim_small = F.broadcast(
        dim.select(F.col(dim_key).alias("__dim_key"), F.col(dim_id)).dropDuplicates(
            ["__dim_key"]
        )
    )
    return facts.join(
        dim_small, on=facts[fact_key] == dim_small["__dim_key"], how=how
    ).drop("__dim_key")


def prefix_join(
    answers: DataFrame,
    tipos: DataFrame,
    answer_col: str,
    tipo_desc: str = "descricao_tipo_disp",
    tipo_id: str = "id_tipo_disp",
) -> DataFrame:
    """J4 — availability-type prefix theta-join (etl_ui.py:613-621).

    An answer column name matches type *t* when
    ``norm(colname).startswith(norm(t + " -"))``. Executed as a
    BroadcastNestedLoopJoin — correct and cheap because the build side is a
    handful of availability types; never use for large build sides.

    When several types prefix-match, the reference keeps the first match in
    dict order; we keep the longest prefix (deterministic, order-free) —
    equivalent unless one type string is a prefix of another.

    Multi-match resolution ranks within a materialized row identity (the
    input's row key, added here if absent) — never within the full input
    column tuple, which would silently collapse exactly-duplicate input
    rows to one output row.
    """
    from fefal_etl_spark.operators.dedup import ROW_KEY, with_row_key

    had_key = ROW_KEY in answers.columns
    keyed = answers if had_key else with_row_key(answers)
    t = F.broadcast(
        tipos.select(
            F.col(tipo_id).alias("__tipo_id"),
            normalize_text(F.concat(F.col(tipo_desc), F.lit(" -"))).alias("__prefix"),
        )
    )
    joined = keyed.join(
        t, on=normalize_text(F.col(answer_col)).startswith(t["__prefix"]), how="left"
    )
    from pyspark.sql import Window

    w = Window.partitionBy(keyed[ROW_KEY]).orderBy(
        F.length("__prefix").desc_nulls_last()
    )
    out = (
        joined.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .drop("__rk", "__prefix")
        .withColumnRenamed("__tipo_id", tipo_id)
    )
    return out if had_key else out.drop(ROW_KEY)


def anti_join_new_keys(new: DataFrame, existing: DataFrame, on: str | list[str]) -> DataFrame:
    """J5 — rows of ``new`` whose key is absent from ``existing``
    (etl_ui.py:446-448): the "which dim values must be inserted" primitive.
    """
    keys = [on] if isinstance(on, str) else list(on)
    return new.join(existing.select(*keys).dropDuplicates(keys), on=keys, how="left_anti")


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_start: str,
    right_end: str,
    on: str | list[str] | None = None,
    bucket_seconds: int = 86_400,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join: left rows whose timestamp ``left_point``
    falls in a right row's half-open interval ``[right_start, right_end)``
    (plus optional equi-keys ``on``). SURVEY.md §2.3 lists range/interval
    joins among the exposed extensions beyond the reference's equi-joins.

    Spark-first plan — bucketize, NOT a theta join: a raw inequality join
    falls back to BroadcastNestedLoopJoin (quadratic, or OOM when neither
    side broadcasts). Instead each right interval is exploded to every
    time bucket it overlaps, each left point hashes to exactly ONE bucket,
    and the join becomes an equi-join on (bucket, keys) followed by the
    exact interval filter. No duplicate matches are possible (a point
    lives in one bucket) so no dedup pass is needed. Pick
    ``bucket_seconds`` ≈ the typical interval length: the explode factor
    is ⌈interval/bucket⌉ + 1 copies per right row, and larger buckets
    trade fewer copies for more false-candidate pairs in the filter.

    Payload column names must be disjoint between the two sides (the
    equi-join merges only bucket + key columns).
    """
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    l_b = left.withColumn(
        "__bucket", F.floor(F.unix_timestamp(F.col(left_point)) / bucket_seconds)
    )
    r_b = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(right_start)) / bucket_seconds),
                F.floor(F.unix_timestamp(F.col(right_end)) / bucket_seconds),
            )
        ),
    )
    return (
        l_b.join(r_b, on=["__bucket", *keys], how=how)
        .filter(
            (F.col(left_point) >= F.col(right_start))
            & (F.col(left_point) < F.col(right_end))
        )
        .drop("__bucket")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: dict[str, str] | None = None,
    direction: str = "backward",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Backward as-of join: each left row gets the latest right row with the
    same key and ``right_ts <= left_ts`` (inclusive), left-outer — NULLs
    when no prior right row exists. SURVEY.md §2.3 lists as-of joins as an
    exposed extension beyond the reference's equi-joins; this is the
    operator Spark lacks natively (DuckDB spells it ``ASOF JOIN``, the
    oracle twin).

    Spark-first plan — union-then-window, NOT a theta join: tag both inputs,
    union by key, and ``last(..., ignorenulls=True)`` the right payload over
    a (key, time)-ordered running window. One shuffle on the key, sorted
    within partitions, no range-explosion and no per-row probe — survives
    arbitrarily large sides at 100 TB (a theta ``BETWEEN`` join would
    nested-loop). Right rows sort before left rows at equal timestamps,
    which is what makes the match inclusive.

    ``right_cols`` maps right payload column → output name (default: every
    non-key, non-timestamp right column, prefixed ``right_``). The right
    timestamp is always emitted under ``right_cols.get(right_ts,
    "right_" + right_ts)``. Right rows duplicated on (key, ts) should be
    deduped by the caller if tie-breaking must be deterministic.

    ``direction="forward"`` flips the match to the EARLIEST right row with
    ``right_ts >= left_ts`` (the "next event" join — attribution to the
    following purchase, next sensor reading): same union-then-window plan
    with a following-frame ``first(ignorenulls)`` and the tag order
    flipped so an equal-timestamp right row is still visible.
    ``tolerance_seconds`` NULLs the match when |left_ts − matched_ts|
    exceeds it (kdb/pandas ``tolerance`` semantics) — a narrow
    post-projection, no change to the shuffle shape.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = {
            c: f"right_{c}" for c in right.columns if c not in (*keys, right_ts)
        }
    right_cols = {right_ts: f"right_{right_ts}", **right_cols}

    payload = [c for c in right_cols if c != right_ts]
    # The whole right row travels as ONE nullable struct so the window
    # match is row-ATOMIC: per-column first/last(ignorenulls) would pick
    # each payload column from the nearest row where THAT column is
    # non-null, stitching values from different right rows into one match
    # whenever a payload value is legitimately NULL (and letting the
    # tolerance gate validate a timestamp while emitting another row's
    # payload) — the confirmed frankenrow bug this struct eliminates.
    r_struct_type = (
        "struct<"
        + ",".join(
            f"{c}:{right.schema[c].dataType.simpleString()}"
            for c in (*payload, right_ts)
        )
        + ">"
    )
    l_tagged = left.select(
        *keys,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left.columns if c not in keys and c != left_ts],
        F.lit(None).cast(r_struct_type).alias("__r"),
    )
    r_tagged = right.select(
        *keys,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in keys and c != left_ts
        ],
        F.struct(
            *[F.col(c) for c in payload], F.col(right_ts).alias(right_ts)
        ).alias("__r"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    if direction == "backward":
        # right (side 0) sorts BEFORE left at equal t → inclusive match
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__t").asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

        def pick(c):
            return F.last(c, ignorenulls=True).over(w)

    else:
        # left (side 1) sorts BEFORE right at equal t → the following-frame
        # first() still sees an equal-timestamp right row (inclusive)
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__t").asc(), F.col("__side").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )

        def pick(c):
            return F.first(c, ignorenulls=True).over(w)

    filled = unioned.select("*", pick(F.col("__r")).alias("__m"))
    out_left = [c for c in left.columns if c not in keys and c != left_ts]
    m = F.col("__m")
    if tolerance_seconds is not None:
        # Interval comparison (not unix_timestamp, which truncates to whole
        # seconds and would mis-gate boundary matches on sub-second data):
        # |l - r| as a day-time interval keeps microsecond precision, works
        # for TIMESTAMP and TIMESTAMP_NTZ alike, and involves no session-tz
        # conversion. greatest(d, -d) is |d| (intervals have no abs()).
        delta = F.col("__t") - m[right_ts]
        within = F.greatest(delta, -delta) <= F.expr(
            f"INTERVAL '{float(tolerance_seconds):.6f}' SECOND"
        )
        m = F.when(within, m)
    match_cols = [m[c].alias(right_cols[c]) for c in payload] + [
        m[right_ts].alias(right_cols[right_ts])
    ]
    return filled.filter(F.col("__side") == 1).select(
        *keys,
        F.col("__t").alias(left_ts),
        *out_left,
        *match_cols,
    )
