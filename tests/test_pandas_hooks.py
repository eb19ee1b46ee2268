"""X3 extension-hook tests: UDAF, grouped map, stateful streaming."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from fefal_etl_spark.operators.pandas_hooks import (
    RUNNING_COUNT_SCHEMA,
    grouped_agg_udf,
    grouped_apply,
    running_counts_stateful,
)

TMP = "/root/repo/.tmp/test_hooks"


def test_grouped_agg_udf(spark):
    import numpy as np

    df = spark.createDataFrame(
        [(1, float(v)) for v in range(100)] + [(2, 5.0)], "k int, v double"
    )
    tm = grouped_agg_udf()
    got = {
        r["k"]: r["m"]
        for r in df.groupBy("k").agg(tm(F.col("v")).alias("m")).collect()
    }
    a = np.sort(np.arange(100.0))
    assert got[1] == pytest.approx(float(a[10:90].mean()))
    assert got[2] == 5.0


def test_grouped_apply_normalize_per_group(spark):
    def center(pdf):
        pdf = pdf.copy()
        pdf["v"] = pdf["v"] - pdf["v"].mean()
        return pdf

    df = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, 5.0)], "k int, v double"
    )
    out = grouped_apply(df, ["k"], center, "k int, v double")
    got = sorted(map(tuple, out.collect()))
    assert got == [(1, -5.0), (1, 5.0), (2, 0.0)]


def test_running_counts_stateful_stream(spark):
    from fefal_etl_spark.datasets import load_table
    from fefal_etl_spark.streaming.events import read_event_stream

    os.makedirs(TMP, exist_ok=True)
    path = os.path.join(TMP, "events")
    ev = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .limit(500)
    )
    ev.repartition(1).write.mode("overwrite").parquet(path)
    try:
        stream = read_event_stream(spark, path)
        out = running_counts_stateful(stream)
        q = (
            out.writeStream.format("memory")
            .queryName("t_stateful")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            r["user_id"]: (r["n_events_total"], r["sum_value_total"])
            for r in spark.sql(
                # keep the LAST update per user (update mode emits per batch)
                """SELECT user_id, n_events_total, sum_value_total FROM (
                       SELECT *, row_number() OVER (
                           PARTITION BY user_id ORDER BY n_events_total DESC) rk
                       FROM t_stateful) WHERE rk = 1"""
            ).collect()
        }
        want = {
            r["user_id"]: (r["n"], r["s"])
            for r in ev.groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.coalesce(F.col("value"), F.lit(0.0))).alias("s"),
            )
            .collect()
        }
        assert set(got) == set(want)
        for u in want:
            assert got[u][0] == want[u][0]
            assert got[u][1] == pytest.approx(want[u][1])
    finally:
        shutil.rmtree(TMP, ignore_errors=True)
