"""Skew- and layout-aware join utilities (SURVEY.md §4 partitioning row;
docs/SCALE.md).

Three tools for the three big-join regimes at 100 TB:

- ``broadcast`` hint (operators.joins) — small dim: no shuffle at all.
- :func:`salted_join` — large ⋈ large with a skewed key: AQE's skew-join
  handles sort-merge skew automatically, but aggregate-after-join or
  deliberate repartition patterns still hot-spot; salting spreads each hot
  key over N sub-partitions deterministically.
- bucketed tables (:func:`fefal_etl_spark.sources.writers.write_bucketed`)
  — repeated joins on the same key: pay the shuffle once at write time,
  then every join/aggregation on the bucket key is exchange-free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, salt_col: str = "__salt") -> DataFrame:
    """Deterministic row salt in [0, n_salts) — hash-derived, not random, so
    retries/speculative tasks agree."""
    return df.withColumn(
        salt_col,
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts)).cast("int"),
    )


def explode_salt(df: DataFrame, n_salts: int, salt_col: str = "__salt") -> DataFrame:
    """Replicate each row once per salt value (build side of a salted join).

    Cost: n_salts× the build side — use only when the build side is much
    smaller than the skewed probe side but too big to broadcast.
    """
    return df.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn(salt_col, F.col(salt_col).cast("int"))


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: str | list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``probe`` has skewed keys: probe rows get a
    deterministic salt, build rows are replicated across all salts, and the
    join key becomes (key, salt) — each formerly-hot partition splits into
    ``n_salts`` even ones.

    Semantically identical to ``probe.join(build, on, how)`` for inner/left
    joins (each probe row still matches each build row exactly once, because
    a build row appears once per salt and a probe row has one salt).
    """
    keys = [on] if isinstance(on, str) else list(on)
    p = with_salt(probe, n_salts)
    b = explode_salt(build, n_salts)
    out = p.join(b, on=keys + ["__salt"], how=how)
    return out.drop("__salt")


def repartition_for_join(
    df: DataFrame, keys: list[str], num_partitions: int | None = None
) -> DataFrame:
    """Pre-shuffle onto the join key so several downstream joins/aggregations
    on the same key reuse ONE exchange (Spark reuses compatible
    hash-partitionings across stages)."""
    if num_partitions:
        return df.repartition(num_partitions, *[F.col(k) for k in keys])
    return df.repartition(*[F.col(k) for k in keys])


def heavy_hitters(
    df: DataFrame, key_col: str, top_n: int = 10
) -> DataFrame:
    """Skew DIAGNOSIS — the audit that decides which keys need
    ``salted_join``/AQE skew handling: per-key row counts, the global
    share of each, and the key's rank; only the ``top_n`` heaviest keys
    return (count desc, key asc — deterministic).

    One map-side-combinable count per key, a one-row total broadcast back,
    then ``TakeOrderedAndProject`` for the top-N (never a global sort). At
    100 TB swap the exact per-key count for a Count-min/Misra-Gries pass
    only if the KEY CARDINALITY itself is the bottleneck — the exact
    groupBy moves one row per distinct key, which is almost always fine.
    """
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    total = counts.agg(F.sum("n_rows").alias("__tot"))
    # orderBy().limit() plans as TakeOrderedAndProject (per-partition heap +
    # driver merge of top_n·partitions rows) — NOT a row_number over an
    # unpartitioned window, which would sort the whole key-cardinality
    # frame in one partition. Rank is assigned afterwards on the tiny
    # top_n-row result.
    top = counts.orderBy(F.col("n_rows").desc(), F.col(key_col).asc()).limit(top_n)
    ranked = (
        top.crossJoin(F.broadcast(total))
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("n_rows").desc(), F.col(key_col).asc())
            ),
        )
    )
    return ranked.select(
        key_col, "n_rows", (F.col("n_rows") / F.col("__tot")).alias("frac"), "rank"
    )


def hybrid_skew_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    hot_keys: DataFrame | None = None,
    top_n_hot: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Hybrid hot-key isolation join — the third classic skew weapon
    alongside salting and AQE: split the probe by key frequency, join the
    HOT slice against a broadcast of the (tiny) matching build rows, join
    the COLD remainder with a normal shuffle, and union. The hot keys are
    the ones a shuffle cannot spread (every copy of key K lands in one
    partition by definition); isolating them converts the straggler
    partition into a map-side broadcast join while the well-distributed
    bulk keeps the plain plan.

    ``hot_keys`` (one column named ``on``) defaults to the probe's
    ``top_n_hot`` most frequent keys (`heavy_hitters` is the production
    feeder — compute once, reuse). Semantics are exactly the plain join
    for ``inner`` and ``left`` (property-tested); the build side must be
    key-unique for `left` to avoid double-fanout, as with any join.

    Scale: one pass over the probe for the frequency top-N (skippable
    when hot_keys is supplied), broadcast of hot build rows (≤ top_n_hot
    keys' worth), and the cold shuffle that was already being paid —
    minus its stragglers.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    if hot_keys is None:
        hot_keys = (
            probe.groupBy(on)
            .agg(F.count(F.lit(1)).alias("__n"))
            .orderBy(F.col("__n").desc(), F.col(on))
            .limit(top_n_hot)
            .select(on)
        )
    hot = F.broadcast(hot_keys)
    probe_hot = probe.join(hot, on, "left_semi")
    probe_cold = probe.join(hot, on, "left_anti")
    build_hot = build.join(hot, on, "left_semi")
    out_hot = probe_hot.join(F.broadcast(build_hot), on, how)
    out_cold = probe_cold.join(build, on, how)
    return out_hot.unionByName(out_cold)
