"""The r3 driver-red `ab_test_ztest` was armed by a degenerate fixture:
every user in the shared events.parquet converts, so the pooled rate is
1.0 and the z denominator is exactly 0 (NULL z is the statistically
correct readout there, now produced via try_divide under both ANSI modes).

The shared fixture cannot be regenerated from this repo (read-only), so
this module builds a SYNTHETIC events table with a ~40% conversion rate
and verifies the whole statistic end-to-end against a hand-rolled
pandas/math computation — covering the branch the shared fixture never
exercises: a finite, correct z-score."""

import pytest
import math

from pyspark.sql import functions as F

from fefal_etl_spark.queries import get_queries


def _write_events(spark, path: str) -> None:
    # 200 users, purchase iff user_id % 5 < 2 (40%); one view event each
    rows = []
    eid = 0
    for u in range(200):
        rows.append((eid, "2024-01-01 10:00:00", u, "view", 1.0))
        eid += 1
        if u % 5 < 2:
            rows.append((eid, "2024-01-01 10:05:00", u, "purchase", 9.99))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).select(
        "event_id",
        F.col("ts").cast("timestamp_ntz").alias("ts"),
        "user_id",
        "event_type",
        "value",
        F.lit("{}").alias("props"),
    )
    df.coalesce(1).write.mode("overwrite").parquet(path)


@pytest.mark.slow
def test_ztest_finite_on_nondegenerate_conversion(spark, tmp_path):
    sf_dir = str(tmp_path)
    _write_events(spark, f"{sf_dir}/events.parquet")
    row = get_queries()["ab_test_ztest"](spark, sf_dir).collect()[0]

    n0, c0, n1, c1 = row["n0"], row["c0"], row["n1"], row["c1"]
    assert n0 + n1 == 200
    assert c0 + c1 == 80  # 40% conversion overall
    # hand-rolled two-proportion z
    p0, p1 = c0 / n0, c1 / n1
    pool = (c0 + c1) / (n0 + n1)
    z = (p1 - p0) / math.sqrt(pool * (1 - pool) * (1 / n0 + 1 / n1))
    assert row["z_score"] is not None
    assert abs(row["z_score"] - round(z, 6)) < 1e-9
    assert row["rate_a"] == round(p0, 6)
    assert row["rate_b"] == round(p1, 6)


def test_ztest_null_on_degenerate_pool_under_ansi(spark, tmp_path):
    """All-convert fixture → pooled variance 0 → z must be NULL (not a
    DIVIDE_BY_ZERO throw) with ANSI on — the exact r3 driver failure."""
    sf_dir = str(tmp_path)
    rows = [(i, "2024-01-01 10:00:00", i, "purchase", 1.0) for i in range(40)]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).select(
        "event_id",
        F.col("ts").cast("timestamp_ntz").alias("ts"),
        "user_id",
        "event_type",
        "value",
        F.lit("{}").alias("props"),
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/events.parquet")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        row = get_queries()["ab_test_ztest"](spark, sf_dir).collect()[0]
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "false")
    assert row["z_score"] is None
    assert row["rate_a"] == 1.0 and row["rate_b"] == 1.0
