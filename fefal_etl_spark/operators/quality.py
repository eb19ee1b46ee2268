"""Data-quality operators: column profiling and constraint checks.

The reference pipeline embeds ad-hoc data-quality decisions (bad-name row
filter etl_ui.py:232-268, >0 gates, null handling); production warehouses
run the same logic as a declarative DQ suite over every load. Both
operators here compute EVERYTHING in one pass over the table — the number
of checks/columns adds expression width, never extra scans or shuffles —
which is the only formulation that survives a 100 TB fact table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Column-level profile: one row per column with row/null/distinct
    counts and string-rendered min/max — the standard ingest health report
    (nullability drift, cardinality explosions, out-of-range values show
    up here before they corrupt a load).

    ONE aggregation job for every column: the per-column stats are struct
    fields of a single agg row, exploded to rows afterwards (driver-side
    width, zero extra scans). ``countDistinct`` per column rewrites to an
    Expand — cost grows with column count, so at 100 TB swap exact
    distinct for ``approx_count_distinct`` (one HLL sketch per column,
    single pass, no Expand); the exact form is kept here because the
    DuckDB oracle must agree on the value.
    """
    aggs = []
    for c in cols:
        aggs.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                (F.count(F.lit(1)) - F.count(c)).cast("long").alias("n_nulls"),
                F.countDistinct(c).cast("long").alias("n_distinct"),
                # min/max in the column's own type, rendered AFTER the agg
                # (string-min of an int column would be lexicographic)
                F.min(F.col(c)).cast("string").alias("min_val"),
                F.max(F.col(c)).cast("string").alias("max_val"),
            ).alias(f"__p_{c}")
        )
    one = df.agg(*aggs)
    stacked = one.select(
        F.explode(F.array(*[F.col(f"__p_{c}") for c in cols])).alias("p")
    )
    return stacked.select("p.*")


def dq_checks(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """Row-level constraint suite: each check is a boolean Column (true =
    row passes); output is (check, n_rows, n_violations) per check — the
    gate a load job asserts on before publishing a partition.

    All checks evaluate in ONE aggregation over one scan (conditional
    sums); a NULL check result counts as a violation (three-valued logic
    must not let unknowns slip through a gate).
    """
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for name, cond in checks.items():
        # coalesce: SUM over zero rows is NULL — an empty load must report
        # 0 violations, not None (a `if row.n_violations:` gate would
        # otherwise publish on None)
        aggs.append(
            F.coalesce(F.sum(F.when(cond, 0).otherwise(1)), F.lit(0))
            .cast("long")
            .alias(f"__v_{name}")
        )
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("check"),
                F.col("__n").alias("n_rows"),
                F.col(f"__v_{name}").alias("n_violations"),
            )
            for name in checks
        ]
    )
    return one.select(F.explode(rows).alias("r")).select("r.*")


def uniqueness_violations(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Key-uniqueness audit: (n_rows, n_distinct_keys, n_violations) where
    n_violations = rows beyond the first per duplicated key. One
    map-side-combinable count per key then one tiny roll-up — at 100 TB
    this is the same single shuffle any exact distinct count pays.
    """
    per_key = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("__c"))
    return per_key.agg(
        F.coalesce(F.sum("__c"), F.lit(0)).cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_keys"),
        F.coalesce(F.sum(F.col("__c") - 1), F.lit(0))
        .cast("long")
        .alias("n_violations"),
    )


def equi_width_histogram(
    df: DataFrame, col: str, buckets: int = 20, scale: int = 100
) -> DataFrame:
    """Exact equi-width histogram of a numeric column — the profiling /
    skew-diagnosis companion to `profile_columns` (a histogram is what
    turns min/max into a usable distribution for choosing range-partition
    bounds, spotting outliers, and sizing salting).

    Engine-exact by construction: values are first quantized to integer
    units (``round(x·scale)`` — one multiply + correctly-rounded round,
    identical in any IEEE engine), then the bucket id is the ALL-INTEGER
    ``(c - lo) · buckets DIV (hi - lo + 1)`` — no float width for two
    engines to disagree on, and the +1 keeps the max value inside the
    last bucket without a clamp.

    Scale: one min/max aggregation (map-side combinable) broadcast back
    as a one-row frame, then one groupBy on the bucket id — at most
    ``buckets`` groups, so the shuffle is as small as a shuffle gets.
    Empty buckets produce no row (sparse output).

    Output: (bucket, n, lo_units, hi_units) — lo/hi are the actual
    min/max quantized values inside each bucket.
    """
    c = F.round(F.col(col) * scale, 0).cast("long")
    mm = df.agg(F.min(c).alias("__lo"), F.max(c).alias("__hi"))
    bucket = F.when(F.col("__hi") == F.col("__lo"), F.lit(0)).otherwise(
        F.expr(f"CAST((__c - __lo) * {buckets} DIV (__hi - __lo + 1) AS INT)")
    )
    return (
        df.select(c.alias("__c"))
        .crossJoin(F.broadcast(mm))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.min("__c").alias("lo_units"),
            F.max("__c").alias("hi_units"),
        )
    )


def mad_outliers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: float = 3.0,
    stat_round: int | None = None,
) -> DataFrame:
    """Robust per-group outlier detection by Median Absolute Deviation:
    flag rows where |x − median| > k · 1.4826 · MAD (1.4826 scales MAD to
    σ under normality — the standard robust z-score). Unlike mean/stddev
    gates, a handful of extreme values cannot drag the threshold (50%
    breakdown point), which is the property that matters on raw event
    streams where the outliers ARE the contamination.

    Two grouped percentile aggregations (median of x, then median of
    |x − med|) + one broadcast join back — the group stats frame is
    group-cardinality-small. Exact `percentile` keeps oracle parity; at
    100 TB swap in `approx_percentile(…, 0.5, 10000)` for one-pass sketch
    medians (documented trade: ±ε quantile error, no sort).

    Returns the input rows that breach the gate, plus (group median, mad,
    robust_z). Groups with MAD = 0 (constant bulk) flag any x ≠ median.
    ``stat_round`` rounds median and MAD to that many decimals BEFORE the
    gate — engines interpolate percentiles with differently-ordered IEEE
    expressions, and an ulp at the gate flips boundary rows (oracle-parity
    queries pass 6).
    """
    def _r(c):
        return F.round(c, stat_round) if stat_round is not None else c

    med = df.groupBy(*group_cols).agg(
        _r(F.expr(f"percentile({value_col}, 0.5)")).alias("__med")
    )
    with_med = df.join(F.broadcast(med), group_cols)
    mad = (
        with_med.groupBy(*group_cols)
        .agg(
            _r(F.expr(f"percentile(abs({value_col} - __med), 0.5)")).alias("__mad")
        )
    )
    scored = with_med.join(F.broadcast(mad), group_cols)
    dev = F.abs(F.col(value_col) - F.col("__med"))
    gate = dev > F.lit(k) * F.lit(1.4826) * F.col("__mad")
    robust_z = F.when(
        F.col("__mad") > 0, dev / (F.lit(1.4826) * F.col("__mad"))
    )
    return (
        scored.filter(gate)
        .withColumn("robust_z", robust_z)
        .withColumnsRenamed({"__med": "group_median", "__mad": "group_mad"})
    )


def skyline_2d(
    points: DataFrame,
    x: str,
    y: str,
    band_width: float = 100.0,
) -> DataFrame:
    """2-D skyline (Pareto frontier, minimize both): the distinct (x, y)
    points not dominated by any other (≤ on both, < on one). Returns the
    input columns plus ``n_points`` (multiplicity of the frontier point).

    The distributed-skyline shape (Börzsönyi et al., ICDE 2001): one hash
    aggregation to distinct points, a coarse prune against the running
    minimum of strictly-lower x-bands (band grid is value-range-bounded —
    target ~1k bands via ``band_width``), then one ordered window over the
    band-survivors only: sorted by (x, y), a point survives iff its y is
    strictly below every predecessor's. Shared by `skyline_parts` and the
    brute-force equivalence test (tests/test_round4_ops.py), so the query
    and the verified algebra cannot drift apart."""
    from pyspark.sql import Window

    pts = points.groupBy(
        F.col(x).alias("__x"), F.col(y).alias("__y")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_points"))
    banded = pts.withColumn("__band", F.floor(F.col("__x") / band_width))
    band_min = banded.groupBy("__band").agg(F.min("__y").alias("__bmin"))
    wband = Window.orderBy("__band").rowsBetween(
        Window.unboundedPreceding, -1
    )
    prev_min = band_min.select(
        "__band", F.min("__bmin").over(wband).alias("__lower_min")
    )
    cand = banded.join(F.broadcast(prev_min), "__band").filter(
        F.col("__lower_min").isNull()
        | (F.col("__y") < F.col("__lower_min"))
    )
    wpt = Window.orderBy("__x", "__y").rowsBetween(
        Window.unboundedPreceding, -1
    )
    rmin = F.min("__y").over(wpt)
    return (
        cand.select("__x", "__y", "n_points", rmin.alias("__rmin"))
        .filter(F.col("__rmin").isNull() | (F.col("__y") < F.col("__rmin")))
        .select(
            F.col("__x").alias(x), F.col("__y").alias(y), "n_points"
        )
    )
