"""Data-layout optimization: Z-order (Morton) clustering keys.

At 100 TB the dominant read-cost lever is not the query plan but the FILE
LAYOUT: parquet row-group min/max statistics prune IO only when rows that
are close in query-predicate space are close on disk. Sorting by one column
optimizes one predicate dimension and destroys the other; interleaving the
bits of several columns (a Z-order / Morton curve) gives every interleaved
dimension locality at once — the technique Delta Lake's `OPTIMIZE ZORDER
BY` and ClickHouse/Databricks data-skipping layouts use (public knowledge;
Morton 1966).

Everything here is exact integer arithmetic on JVM-side expressions (shifts
+ masks unrolled per bit — no UDF, no shuffle), so the key is a pure
function of the row and both engines agree bit-for-bit. The intended write
path is::

    df.withColumn("z", zorder_key(F.col("a"), F.col("b")))
      .repartitionByRange(n_files, "z")      # range shuffle → one z-band per file
      .sortWithinPartitions("z")             # row groups within the file
      .write.parquet(path)

after which a predicate on EITHER `a` or `b` prunes most files by their
min/max stats. ``zorder_stats`` measures the clustering quality that makes
that pruning work (per-bucket value ranges shrink vs an unclustered
layout).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key_n(cols: list[Column], bits: int = 16) -> Column:
    """N-dimensional Morton interleave (round 6): result bit n·k+i = bit
    k of ``cols[i]`` — the ≥3-column form Delta's OPTIMIZE ZORDER BY
    takes. ``n·bits`` must fit a signed long (≤ 63); with default
    16 bits that caps at 3 columns — pass smaller ``bits`` for more
    dimensions (clustering quality per dimension falls as 1/n anyway,
    which is why z-ordering beyond 3-4 columns stops paying — documented
    so callers don't cargo-cult 8-column keys).

    Same contract as the 2-column form: callers map raw values into
    [0, 2^bits) first; unrolled shift/mask terms stay inside whole-stage
    codegen."""
    n = len(cols)
    if n < 2:
        raise ValueError("zorder needs >= 2 columns")
    if n * bits > 63:
        raise ValueError(
            f"{n} cols x {bits} bits = {n * bits} key bits > 63; "
            "reduce bits"
        )
    masked = [
        c.cast("long").bitwiseAND(F.lit((1 << bits) - 1)) for c in cols
    ]
    z = F.lit(0).cast("long")
    for k in range(bits):
        for i, m in enumerate(masked):
            z = z + F.shiftleft(
                F.shiftright(m, k).bitwiseAND(F.lit(1)), n * k + i
            )
    return z


def zorder_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of two non-negative integer
    columns: result bit 2k = bit k of ``a``, bit 2k+1 = bit k of ``b``
    (the 2-column specialization of :func:`zorder_key_n`).

    Callers map raw values into [0, 2^bits) first — rank, quantile bucket,
    or truncation (``zorder_stats`` shows the truncation form). Unrolled
    shift/mask terms (2·bits adds) stay inside whole-stage codegen; 16 bits
    × 2 columns = a 32-bit key, enough to address 4G distinct z-cells —
    row-group pruning needs far fewer.
    """
    return zorder_key_n([a, b], bits=bits)


def zorder_stats(
    df: DataFrame,
    a_col: str,
    b_col: str,
    bits: int = 16,
    bucket_bits: int = 6,
) -> DataFrame:
    """Clustering-quality audit for a prospective Z-order layout: compute
    the Morton key over the two (truncated) dimensions, group rows into
    the ``2^bucket_bits`` leading-z-bit buckets a range-partitioned write
    would produce, and report each bucket's row count and per-dimension
    min/max span — the exact min/max statistics parquet would store per
    file, i.e. what the reader's pruning sees.

    One map-side-combinable aggregation; the z-key itself is narrow
    codegen arithmetic. Buckets with tight spans in BOTH dimensions =
    predicates on either column skip most buckets.
    """
    z = zorder_key(F.col(a_col), F.col(b_col), bits=bits)
    bucket = F.shiftright(z, 2 * bits - bucket_bits)
    return (
        df.select(
            F.col(a_col).alias("__a"),
            F.col(b_col).alias("__b"),
            bucket.alias("z_bucket"),
        )
        .groupBy("z_bucket")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.min("__a").cast("long").alias("a_min"),
            F.max("__a").cast("long").alias("a_max"),
            F.min("__b").cast("long").alias("b_min"),
            F.max("__b").cast("long").alias("b_max"),
        )
    )
