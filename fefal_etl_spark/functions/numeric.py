"""Numeric scalar functions (SURVEY.md §2.9 F15–F17; A1/A2 rescale).

All coercions use ``try_cast`` so parse failures yield NULL (pandas
``errors="coerce"`` parity) under both ANSI and non-ANSI sessions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def to_numeric_coerce(col: Column) -> Column:
    """F15: parse to double, NULL on failure (etl_ui.py:180, 307)."""
    return col.cast("string").try_cast("double")


def validate_numeric(col: Column) -> Column:
    """F16: ``max(int(float(v)), 0)``; parse failure → 0 (etl_ui.py:227-232).

    ``int()`` truncates toward zero; negatives are clamped to 0 afterwards,
    so plain truncation of non-negatives is sufficient. Values beyond int64
    saturate at Long.MAX (the reference's unbounded Python int would not fit
    the DW INT column either).
    """
    parsed = to_numeric_coerce(col)
    # ±Infinity parses as a valid double ('1e310') but the reference's
    # int(float(v)) raises OverflowError there → 0; treat as parse failure.
    finite = F.when(
        parsed.isin(float("inf"), float("-inf")), F.lit(None)
    ).otherwise(parsed)
    truncated = finite.cast("long")  # toward-zero for the values that survive
    return F.greatest(F.coalesce(truncated, F.lit(0)), F.lit(0)).cast("long")


def round_half_even(col: Column) -> Column:
    """F17: banker's rounding to integer — matches numpy/pandas ``.round()``
    (etl_ui.py:184). Spark's ``bround`` is HALF_EVEN; plain ``round`` is
    HALF_UP and would diverge on *.5 values."""
    return F.bround(col)


def rescale_to_100(
    df: DataFrame,
    colname: str,
    out: str | None = None,
    rounding: str = "half_even",
) -> DataFrame:
    """A1+A2: min-max rescale a percentage column to 0–100 by its global max
    (etl_ui.py:177-188): coerce → negatives→NULL → ``round(x/max*100)`` as
    nullable int. If the max is NULL or ≤ 0 the column is left as coerced.

    ``rounding``: 'half_even' (default — numpy/pandas ``.round()`` parity,
    F17) or 'half_up' (SQL-standard ROUND; what DuckDB/Postgres do).

    The global max is a partial-aggregated one-row frame broadcast back onto
    every partition (``crossJoin(broadcast(agg))``): the data side stays
    narrow — no exchange of the fact rows at all. The naive alternative,
    ``max().over(Window.partitionBy())``, funnels the ENTIRE dataset through
    a single window partition (one task) — harmless on toy data, fatal at
    100 TB.
    """
    out = out or colname
    rounder = round_half_even if rounding == "half_even" else F.round
    coerced = to_numeric_coerce(F.col(colname))
    cleaned = F.when(coerced < 0, F.lit(None)).otherwise(coerced)
    tmp = df.withColumn("__pct_clean", cleaned)
    max_df = tmp.agg(F.max("__pct_clean").alias("__pct_max"))
    max_pct = F.col("__pct_max")
    scaled = F.when(
        max_pct.isNotNull() & (max_pct > 0),
        rounder(F.col("__pct_clean") / max_pct * 100).cast("int"),
    ).otherwise(F.col("__pct_clean").cast("int"))
    return (
        tmp.crossJoin(F.broadcast(max_df))
        .withColumn(out, scaled)
        .drop("__pct_clean", "__pct_max")
    )


def zscores_by_group(
    df: "DataFrame",
    value_col: str,
    group_col: str,
    out_col: str = "z",
) -> "DataFrame":
    """Per-group z-score standardization of an INTEGER measure with
    integer-exact moments: z = (n·x − Σx) / sqrt(n·Σx² − (Σx)²), the
    population-variance identity cleared of divisions so every intermediate
    is an exact integer (DECIMAL(38,0) here, HUGEINT in a SQL twin). Both
    engines then perform the SAME single double division and sqrt — which
    is what makes z-scores hash-comparable at all; the textbook
    (x − mean)/std evaluates mean and std in partition-dependent float
    order. Constant groups (zero variance) get z = 0.

    Scale: one groupBy on the group key + a broadcast join of the tiny
    stats frame back onto the stream — never a whole-group window.
    Intermediates stay exact while n·Σx² < 10³⁸ (e.g. 10¹⁰ docs of 10⁴
    tokens² each ≈ 10²⁷ — comfortable; a 128-bit sum would be the next
    step, which is exactly what DuckDB's HUGEINT twin does).
    """
    v = F.col(value_col).cast("decimal(38,0)")
    stats = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("__n"),
        F.sum(v).alias("__s1"),
        F.sum(v * v).alias("__s2"),
    ).withColumnRenamed(group_col, "__g")
    num = (F.col("__n") * v - F.col("__s1")).cast("double")
    den = F.sqrt(
        (F.col("__n") * F.col("__s2") - F.col("__s1") * F.col("__s1")).cast(
            "double"
        )
    )
    z = F.when(den > 0, num / den).otherwise(F.lit(0.0))
    # null-safe join back: groupBy emits a NULL-group stats row, and a plain
    # equi-join would silently DROP every NULL-group input row
    return (
        df.join(
            F.broadcast(stats),
            on=F.col(group_col).eqNullSafe(F.col("__g")),
        )
        .withColumn(out_col, z)
        .drop("__g", "__n", "__s1", "__s2")
    )
