"""Round-11 pinned regressions: the ADVICE-r10 findings — the
rate-limited clean-restart duplication (watermark clamp), lazy SQL view
registration over catalog bindings, and the removed dead admission
fallback — plus this round's feature gates."""

import os

import pytest
from pyspark.sql import functions as F

_posix_log = pytest.mark.skipif(
    os.environ.get("FEFAL_TABLE_BACKEND") == "memory",
    reason="needs the commit log on the filesystem (disk artifact "
    "inspection or DataSource worker-side log reads)",
)


# ----------------------------------------------------------------------
# ADVICE r10 #1 (high): clean restart of a caught-up rate-limited
# stream must not re-deliver already-committed data
# ----------------------------------------------------------------------


def test_rate_limit_clamp_watermark_unit():
    """_RateLimit.clamp_start semantics, driven as Spark drives it.

    Sequence (advice r10): checkpoint committed E, fresh reader admits
    regressed O < E; Spark runs (E, O] then (O, E]. The second batch
    must clamp to empty — the old pos-based clamp's ``end == pos``
    opt-out returned it whole and re-delivered every file in (O, E]."""
    from fefal_etl_spark.streaming.table_source import _RateLimit

    E = {"version": 3}
    O = {"version": 1, "index": 2}

    # crash-retry replay on a fresh reader: emitted in full
    lim = _RateLimit({"maxfilespertrigger": "2"})
    lim.resync({"version": -1})
    assert lim.clamp_start({"version": 1}, E) == {"version": 1}

    # clean-restart regression: (E, O] raises the watermark to E ...
    lim = _RateLimit({"maxfilespertrigger": "2"})
    lim.resync({"version": -1})
    assert lim.clamp_start(E, O) == E  # empty batch (end < start)
    lim.resync(E)
    lim.resync(O)
    # ... so the follow-up (O, E] clamps to (E, E] — empty, not a
    # re-delivery of versions 2..3
    assert lim.clamp_start(O, E) == E
    # and genuinely new data after the regression still flows in full
    assert lim.clamp_start(E, {"version": 5}) == E


@_posix_log
@pytest.mark.slow
def test_stream_rate_limit_clean_restart_no_duplicates(spark, tmp_path):
    """Drain a rate-limited stream to completion, stop cleanly, restart
    on the same checkpoint with NO new commits: the first admission
    regresses behind the checkpoint (pos reseeds at startingVersion)
    and pre-fix the follow-up batch re-emitted the whole table."""
    import time

    from fefal_etl_spark.streaming.table_source import (
        TxnTableStreamDataSource,
    )
    from fefal_etl_spark.table import TransactionalTable

    spark.dataSource.register(TxnTableStreamDataSource)
    root = str(tmp_path / "t")
    t = TransactionalTable(spark, root)
    t.overwrite(
        spark.range(60).select(F.col("id").alias("k")).repartition(6)
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def start():
        df = (
            spark.readStream.format("txn_table_stream")
            .option("path", root)
            .option("maxFilesPerTrigger", "2")
            .load()
        )
        return (
            df.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="100 milliseconds")
            .start()
        )

    q = start()
    deadline = time.time() + 60
    while time.time() < deadline:
        try:
            if spark.read.parquet(out).count() >= 60:
                break
        except Exception:
            pass
        time.sleep(0.2)
    # let the final batch COMMIT (count visible != offset committed):
    # the clean-restart shape needs a fully caught-up checkpoint
    time.sleep(1.5)
    q.stop()
    q.awaitTermination()
    assert spark.read.parquet(out).count() == 60

    # restart with no new data; give it several triggers to run the
    # regressed (E, O] and follow-up (O, E] batches
    q = start()
    time.sleep(4)
    q.stop()
    q.awaitTermination()
    r = spark.read.parquet(out)
    assert r.count() == 60 and r.distinct().count() == 60

    # new appends after the regression/clamp cycle still flow exactly
    t.append(spark.range(60, 70).select(F.col("id").alias("k")))
    q = start()
    deadline = time.time() + 60
    while time.time() < deadline:
        try:
            if spark.read.parquet(out).count() >= 70:
                break
        except Exception:
            pass
        time.sleep(0.2)
    time.sleep(1.0)
    q.stop()
    q.awaitTermination()
    r = spark.read.parquet(out)
    assert r.count() == 70 and r.distinct().count() == 70
    assert sorted(x["k"] for x in r.collect()) == list(range(70))


@_posix_log
@pytest.mark.slow
def test_changes_stream_rate_limit_clean_restart(spark, tmp_path):
    """Same clean-restart shape through the CDF reader (it shares
    _RateLimit and had the same duplication path)."""
    import time

    from fefal_etl_spark.streaming.table_source import (
        TxnTableChangesDataSource,
    )
    from fefal_etl_spark.table import TransactionalTable

    spark.dataSource.register(TxnTableChangesDataSource)
    root = str(tmp_path / "t")
    t = TransactionalTable(spark, root)
    t.overwrite(
        spark.range(40).select(F.col("id").alias("k")).repartition(4)
    )
    t.delete_where("k >= 30")
    # expected feed = the batch change_feed over (-1, latest] (CoW
    # delete rewrites every file repartition(4) scattered k>=30 into:
    # old(-1)/new(+1), so v1 alone is 40 deletes + 30 inserts)
    expect = sorted(
        (r["k"], r["_change_type"])
        for r in t.change_feed(-1, t.latest_version()).collect()
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def start():
        df = (
            spark.readStream.format("txn_table_changes")
            .option("path", root)
            .option("maxFilesPerTrigger", "2")
            .load()
        )
        return (
            df.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="100 milliseconds")
            .start()
        )

    q = start()
    deadline = time.time() + 60
    while time.time() < deadline:
        try:
            if spark.read.parquet(out).count() >= len(expect):
                break
        except Exception:
            pass
        time.sleep(0.2)
    time.sleep(1.5)
    q.stop()
    q.awaitTermination()
    assert spark.read.parquet(out).count() == len(expect)

    q = start()
    time.sleep(4)
    q.stop()
    q.awaitTermination()
    r = spark.read.parquet(out)
    got = sorted(
        (x["k"], x["_change_type"])
        for x in r.select("k", "_change_type").collect()
    )
    assert got == expect  # no re-delivery after the clean restart


# ----------------------------------------------------------------------
# ADVICE r10 #2: lazy SQL view registration over catalog bindings
# ----------------------------------------------------------------------


def test_sql_select_survives_empty_catalog_binding(spark, tmp_path):
    """A bare ``catalog create NAME`` (bound, never written) must not
    break SELECTs that never reference it (pre-fix: _register_views
    read() EVERY binding and FileNotFoundError'd)."""
    from fefal_etl_spark.catalog import TableCatalog
    from fefal_etl_spark.sql_dml import execute_sql
    from fefal_etl_spark.table import TransactionalTable

    cat = TableCatalog(str(tmp_path / "wh"))
    TransactionalTable(spark, cat.create_table("real")).overwrite(
        spark.range(5).select(F.col("id").alias("k"))
    )
    cat.create_table("ghost")  # bound, no committed version
    got = execute_sql(
        spark, "SELECT count(*) AS n FROM real", catalog=cat
    ).collect()
    assert got[0]["n"] == 5
    # referencing the empty binding fails with the NORMAL
    # unknown-table analysis error, not a FileNotFoundError
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        execute_sql(spark, "SELECT * FROM ghost", catalog=cat).collect()
    # MERGE subquery sources go through the same lazy registration
    t = TransactionalTable(spark, cat.resolve("real"))
    execute_sql(
        spark,
        "MERGE INTO real USING (SELECT k FROM real WHERE k < 2) AS s "
        "ON real.k = s.k WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *",
        catalog=cat,
    )
    assert t.read().count() == 5


# ----------------------------------------------------------------------
# VERDICT r10 item 1: INSERT INTO / CREATE TABLE AS through sql_dml
# ----------------------------------------------------------------------


def test_sql_ctas_insert_select_loop(spark, tmp_path):
    """The migrating-SQL-user loop by NAME only: CTAS (partitioned) →
    INSERT INTO (positional, cast) → INSERT OVERWRITE → SELECT."""
    from fefal_etl_spark.catalog import TableCatalog
    from fefal_etl_spark.sql_dml import execute_sql
    from fefal_etl_spark.table import TransactionalTable

    cat = TableCatalog(str(tmp_path / "wh"))
    v = execute_sql(
        spark,
        "CREATE TABLE sales PARTITIONED BY (region) AS "
        "SELECT * FROM VALUES (1, 10.5, 'eu'), (2, 3.25, 'us') "
        "AS x(k, amt, region)",
        catalog=cat,
    )
    assert v == 1  # v0 = snapshot, v1 = the declared partition spec
    t = TransactionalTable(spark, cat.resolve("sales"))
    # partitioned layout reached the manifest AND the spec is DECLARED
    # (review r11: the DDL's layout promise must outlive one commit)
    assert all(
        "region=" in f for f in t._read_manifest(0).files
    )
    assert t._read_manifest(t.latest_version()).partition_spec == [
        "region"
    ]
    # positional INSERT: string '3' casts onto bigint k, int onto amt
    execute_sql(
        spark,
        "INSERT INTO sales VALUES ('3', 7, 'eu')",
        catalog=cat,
    )
    # the append inherited the declared hive layout
    mf = t._read_manifest(t.latest_version())
    assert all("region=" in f for f in mf.files)
    got = execute_sql(
        spark,
        "SELECT region, count(*) AS n, sum(amt) AS s FROM sales "
        "GROUP BY region ORDER BY region",
        catalog=cat,
    ).collect()
    assert [(r["region"], r["n"], r["s"]) for r in got] == [
        ("eu", 2, 17.5),
        ("us", 1, 3.25),
    ]
    # INSERT OVERWRITE replaces the snapshot atomically
    execute_sql(
        spark,
        "INSERT OVERWRITE sales SELECT k, amt, region FROM sales "
        "WHERE region = 'eu'",
        catalog=cat,
    )
    assert t.read().count() == 2
    # the rewrite kept the declared spec and the hive layout
    mf = t._read_manifest(t.latest_version())
    assert mf.partition_spec == ["region"]
    assert all("region=" in f for f in mf.files)
    # IF NOT EXISTS no-ops; plain re-CREATE is loud; OR REPLACE wins
    assert (
        execute_sql(
            spark,
            "CREATE TABLE IF NOT EXISTS sales AS SELECT 1 AS z",
            catalog=cat,
        )
        is None
    )
    assert t.read().count() == 2


def test_sql_insert_ctas_loud_rejections(spark, tmp_path):
    """Unsupported INSERT/CREATE clauses reject loudly (never a silent
    partial execution — the module's contract)."""
    from fefal_etl_spark.catalog import TableCatalog
    from fefal_etl_spark.sql_dml import SqlDmlError, execute_sql

    cat = TableCatalog(str(tmp_path / "wh"))
    execute_sql(
        spark, "CREATE TABLE t1 AS SELECT 1 AS k", catalog=cat
    )
    cases = [
        # column-definition DDL is round-12 surface now; column OPTIONS
        # stay out of the subset
        "CREATE TABLE t2 (k INT NOT NULL)",
        "CREATE TABLE t1 AS SELECT 2 AS k",  # exists, no modifier
        "CREATE OR REPLACE TABLE IF NOT EXISTS t1 AS SELECT 1 AS k",
        "INSERT INTO t1 (k) VALUES (1)",  # column list
        "INSERT INTO t1 SELECT 1, 2",  # arity mismatch
        "INSERT INTO missing SELECT 1",  # unknown target
    ]
    for stmt in cases:
        with pytest.raises(SqlDmlError):
            execute_sql(spark, stmt, catalog=cat)
    with pytest.raises(SqlDmlError):  # CTAS with no catalog
        execute_sql(spark, "CREATE TABLE z AS SELECT 1 AS k")
    # nothing above wrote: t1 still has its single original row
    got = execute_sql(
        spark, "SELECT * FROM t1", catalog=cat
    ).collect()
    assert [r["k"] for r in got] == [1]


# ----------------------------------------------------------------------
# VERDICT r10 item 4: IvfAnnIndex.retrain — centroid-drift recovery
# ----------------------------------------------------------------------


@pytest.mark.slow
def test_ivf_index_retrain_recovers_drift_recall(spark, tmp_path):
    """Planted distribution shift: the index is built with centroids at
    0° and 90°, then a drifted cluster lands at 50° (assigned to the
    90° bucket). A 35° query probing nprobe=1 picks the 0° bucket and
    misses every true neighbor — recall 0. retrain(k=3) refits
    centroids from the indexed vectors (lowest-id seeds 0/1/2 sit one
    per cluster by construction), after which the query probes the
    drifted bucket and recall recovers to 1.0; probe ≡ batch ivf_topk
    under the new centroids; the exactly-once ledger survives the
    rewrite commit."""
    import math

    from fefal_etl_spark.llm.incremental_ann import IvfAnnIndex
    from fefal_etl_spark.llm.similarity import ivf_topk

    def vec(deg, i):
        th = math.radians(deg + 0.001 * i)
        r = 1.0 + 0.01 * i
        return [r * math.cos(th), r * math.sin(th), 0.0, 0.0]

    def frame(rows):
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )

    # original corpus: cluster O1 at ~0° (ids 0,3..11), O2 at ~90°
    # (ids 1,12..20); ids 0 and 1 are the future retrain seeds
    o1 = [(0, vec(0, 0))] + [(i, vec(0, i)) for i in range(3, 12)]
    o2 = [(1, vec(90, 1))] + [(i, vec(90, i)) for i in range(12, 21)]
    cents = frame([(0, vec(0, 0)), (1, vec(90, 0))]).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    idx = IvfAnnIndex(spark, str(tmp_path / "idx"))
    idx.build(frame(o1 + o2), cents)
    # drift batch at ~50° (id 2 = third retrain seed, rest 100+);
    # nearest old centroid is 90° -> all land in bucket 1
    drift = [(2, vec(50, 2))] + [
        (100 + i, vec(50, i)) for i in range(19)
    ]
    assert (
        idx.add_batch(frame(drift), cents, app_id="ing", txn_version=7)
        is not None
    )
    queries = frame([(900, vec(35, 0)), (901, vec(35, 5))])

    def recall_at5(matches):
        # true top-5 of a 35° query = drifted 50° vectors (cos 15°)
        got = [
            r["vec_id"]
            for r in matches
            if r["query_id"] == 900 and r["rk"] <= 5
        ]
        truth = {2} | {100 + i for i in range(19)}
        return len([v for v in got if v in truth]) / 5.0

    before = idx.match_new(queries, cents, nprobe=1, k=5).collect()
    assert recall_at5(before) == 0.0  # wrong bucket probed — drift hurt
    new_cent = idx.retrain(k=3, iters=3)
    after = idx.match_new(queries, new_cent, nprobe=1, k=5).collect()
    assert recall_at5(after) == 1.0  # recovered
    # probe-equivalence vs the batch path under the NEW centroids
    exp = sorted(
        (r["query_id"], r["rk"], r["vec_id"], round(r["cos_sim"], 9))
        for r in ivf_topk(
            idx.table.read().select("vec_id", "embedding"),
            new_cent,
            queries.select(F.col("vec_id").alias("query_id"), "embedding"),
            nprobe=1,
            k=5,
        ).collect()
    )
    got = sorted(
        (r["query_id"], r["rk"], r["vec_id"], round(r["cos_sim"], 9))
        for r in after
    )
    assert got == exp and got
    # bucket layout is the new one and still prunes at the manifest
    kept, total = idx.table.pruned_partition_files(centroid_id=0)
    assert kept < total
    # the exactly-once ledger survived the rewrite: replay no-ops
    n = idx.table.read().count()
    assert (
        idx.add_batch(frame(drift), new_cent, app_id="ing", txn_version=7)
        is None
    )
    assert idx.table.read().count() == n == 40


def test_sql_backslash_escaped_literal_view_scan(spark, tmp_path):
    """Spark SQL's default dialect uses backslash escaping in string
    literals; the lazy reference scan must not misread a \\'-escaped
    quote as a string end (review r11 — a table referenced after one
    was classified as inside the literal and never registered)."""
    from fefal_etl_spark.catalog import TableCatalog
    from fefal_etl_spark.sql_dml import execute_sql
    from fefal_etl_spark.table import TransactionalTable

    cat = TableCatalog(str(tmp_path / "wh"))
    TransactionalTable(spark, cat.create_table("a")).overwrite(
        spark.createDataFrame([("can't",), ("x",)], "note string")
    )
    TransactionalTable(spark, cat.create_table("b")).overwrite(
        spark.range(3).select(F.col("id").alias("k"))
    )
    got = execute_sql(
        spark,
        "SELECT note AS v FROM a WHERE note = 'can\\'t' "
        "UNION ALL SELECT CAST(k AS STRING) FROM b",
        catalog=cat,
    ).collect()
    assert sorted(r["v"] for r in got) == ["0", "1", "2", "can't"]


def test_rate_limit_persistent_wm_survives_fresh_reader():
    """Review r11: the volatile watermark dies with the reader, so a
    crash between the offset-log write and the sink commit of the
    regressed catch-up batch (O, E] replayed it IN FULL on the next
    restart. stamp() rides the watermark in the offset itself: the
    replayed end carries wm=E, and a fresh reader still clamps the
    batch to empty."""
    from fefal_etl_spark.streaming.table_source import _RateLimit

    # run 1 (restarted, caught up at E=3): second admission stamps E
    lim = _RateLimit({"maxfilespertrigger": "2"})
    lim.resync({"version": -1})
    lim.clamp_start({"version": 3}, {"version": 1, "index": 2})  # (E,O]
    lim.resync({"version": 3})
    E = lim.stamp({"version": 3})
    assert E["wm"] == [3, None]
    # crash now: (O, E·wm=3] sits in the offset log uncommitted.
    # run 2: FRESH reader replays the batch — no volatile state at all
    lim2 = _RateLimit({"maxfilespertrigger": "2"})
    lim2.resync({"version": -1})
    got = lim2.clamp_start({"version": 1, "index": 2}, E)
    assert got == {"version": 3}  # clamped empty — no re-delivery
    # a genuine crash-retry batch (S=1, E·wm=1] still emits in full
    lim3 = _RateLimit({"maxfilespertrigger": "2"})
    lim3.resync({"version": -1})
    assert lim3.clamp_start(
        {"version": 1}, {"version": 3, "wm": [1, None]}
    ) == {"version": 1}
    # equality stability: a wm-only refresh returns the LAST stamped
    # dict, so steady state plans no extra batches
    lim4 = _RateLimit({"maxfilespertrigger": "2"})
    lim4.resync({"version": 2})
    first = lim4.stamp({"version": 5})
    lim4.resync({"version": 5})
    second = lim4.stamp({"version": 5})
    assert second == first and first["wm"] == [2, None]


def test_sql_drop_show_describe(spark, tmp_path):
    """The inspection/teardown verbs (round 11): SHOW TABLES lists the
    catalog, DESCRIBE returns the manifest-declared schema in order,
    DROP TABLE unbinds (PURGE deletes managed data; refused for
    external roots by the catalog's own rule)."""
    import os

    from fefal_etl_spark.catalog import TableCatalog
    from fefal_etl_spark.sql_dml import SqlDmlError, execute_sql

    cat = TableCatalog(str(tmp_path / "wh"))
    execute_sql(
        spark,
        "CREATE TABLE t1 PARTITIONED BY (s) AS "
        "SELECT * FROM VALUES (1, 'a') AS x(k, s)",
        catalog=cat,
    )
    shown = execute_sql(spark, "SHOW TABLES", catalog=cat).collect()
    assert [r["name"] for r in shown] == ["t1"]
    desc = execute_sql(spark, "DESCRIBE t1", catalog=cat).collect()
    assert [(r["col_name"], r["data_type"]) for r in desc] == [
        ("k", "int"),
        ("s", "string"),
    ]
    root = cat.resolve("t1")
    assert execute_sql(spark, "DROP TABLE t1 PURGE", catalog=cat) is True
    assert not os.path.exists(root)
    assert execute_sql(spark, "SHOW TABLES", catalog=cat).count() == 0
    assert (
        execute_sql(spark, "DROP TABLE IF EXISTS t1", catalog=cat)
        is False
    )
    with pytest.raises(SqlDmlError):
        execute_sql(spark, "DROP TABLE t1", catalog=cat)
    with pytest.raises(SqlDmlError):
        execute_sql(spark, "SHOW DATABASES", catalog=cat)
    with pytest.raises(SqlDmlError):
        execute_sql(spark, "DESCRIBE missing", catalog=cat)
