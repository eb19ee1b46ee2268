"""Round-9 hardening tests: ADVICE r8 fixes (overflow-free sink
partition grouping, capped maintenance rebase retries, constraint
validation scoped to updated rows) and VERDICT r8 item 3 (bloom
entries survive rewrite commits — compact / zorder / DV-purge /
UPDATE / MERGE)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

_posix_log = pytest.mark.skipif(
    os.environ.get("FEFAL_TABLE_BACKEND") == "memory",
    reason="needs the commit log on the filesystem (disk artifact "
    "inspection or DataSource worker-side log reads)",
)


@pytest.fixture()
def txn_format(spark):
    from fefal_etl_spark.sources.table_batch import TxnTableBatchDataSource

    spark.dataSource.register(TxnTableBatchDataSource)
    return spark


# ----------------------------------------------------------------------
# ADVICE r8: sink partition grouping must not depend on a radix product
# ----------------------------------------------------------------------


@_posix_log
def test_sink_many_partition_columns_no_collisions(txn_format, tmp_path):
    """Five partition columns with nulls and escape-needing values: the
    np.unique row-grouping (which replaced the mixed-radix int64 key —
    advice r8: the radix product could overflow and merge combos) must
    put every row under its own exact hive combo."""
    from fefal_etl_spark.table import TransactionalTable

    spark = txn_format
    root = str(tmp_path / "t")
    rows = [
        (i, f"a{i % 3}", f"b{i % 2}", None if i % 5 == 0 else f"c={i % 4}",
         f"d {i % 2}", f"e/{i % 3}", float(i))
        for i in range(60)
    ]
    df = spark.createDataFrame(
        rows, "k int, p1 string, p2 string, p3 string, p4 string, "
        "p5 string, v double",
    )
    df.coalesce(1).write.format("txn_table").mode("overwrite").option(
        "partitionBy", "p1,p2,p3,p4,p5"
    ).save(root)
    t = TransactionalTable(spark, root)
    got = sorted(
        (r["k"], r["p1"], r["p2"], r["p3"], r["p4"], r["p5"], r["v"])
        for r in t.read().collect()
    )
    assert got == sorted(rows)
    # every file's manifest partition values agree with its row content
    mf = t._read_manifest(t.latest_version())
    assert mf.partitions and len(mf.partitions) == len(mf.files)
    # pruning on a deep combo keeps exactly the matching rows
    sub = t.read_partition(p1="a1", p2="b1").collect()
    assert {r["k"] for r in sub} == {
        k for (k, p1, p2, *_rest) in rows if p1 == "a1" and p2 == "b1"
    }


# ----------------------------------------------------------------------
# ADVICE r8: maintenance rebase loops are capped, not unbounded
# ----------------------------------------------------------------------


def test_rebase_retry_cap_raises(spark, tmp_path, monkeypatch):
    """compact() losing every CAS race must terminate with a clear
    CommitConflict after _REBASE_MAX_RETRIES attempts (advice r8: the
    unbounded loop livelocked under sustained append traffic)."""
    from fefal_etl_spark.table import CommitConflict, TransactionalTable

    t = TransactionalTable(spark, str(tmp_path / "t"))
    t.overwrite(spark.range(100).selectExpr("id AS k").repartition(4))

    calls = {"n": 0}
    real_commit = t._commit

    def losing_commit(files, op, base, **kw):
        if op == "compact":
            calls["n"] += 1
            raise CommitConflict("synthetic race")
        return real_commit(files, op, base, **kw)

    monkeypatch.setattr(t, "_commit", losing_commit)
    monkeypatch.setattr(
        t, "_rebase_appends", lambda base, op: (base, [])
    )
    with pytest.raises(CommitConflict, match="lost .* commit races"):
        t.compact(target_file_mb=1)
    assert calls["n"] == t._REBASE_MAX_RETRIES


# ----------------------------------------------------------------------
# ADVICE r8: update_where constraint check scoped to matched rows
# ----------------------------------------------------------------------


def test_update_where_constraint_on_matched_rows(spark, tmp_path):
    """CHECK constraints still gate an UPDATE's new images (violating
    SET raises; nothing commits), and the predicate evaluates on
    PRE-update values even when it references a SET column."""
    from fefal_etl_spark.table import (
        ConstraintViolation,
        TransactionalTable,
    )

    t = TransactionalTable(spark, str(tmp_path / "t"))
    t.overwrite(
        spark.createDataFrame(
            [(1, 1), (2, 2), (3, 3), (4, 4)], "k int, x int"
        ).repartition(2)
    )
    t.add_constraint("x < 20")
    base = t.latest_version()
    with pytest.raises(ConstraintViolation):
        t.update_where("x < 3", {"x": "100"})
    assert t.latest_version() == base  # nothing committed
    # predicate on pre-update values: x<3 matches exactly {1,2}; the
    # updated images (11,12) must not re-match and cascade
    t.update_where("x < 3", {"x": "x + 10"})
    got = sorted((r["k"], r["x"]) for r in t.read().collect())
    assert got == [(1, 11), (2, 12), (3, 3), (4, 4)]


# ----------------------------------------------------------------------
# VERDICT r8 item 3: blooms survive rewrite commits
# ----------------------------------------------------------------------


def _bloomed_table(spark, path, n=4000, files=8):
    from fefal_etl_spark.table import TransactionalTable

    t = TransactionalTable(spark, str(path))
    df = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("g")
    )
    t.overwrite(df.repartitionByRange(files, "k"))
    t.build_bloom("k")
    return t


def test_bloom_survives_compact(spark, tmp_path):
    """OPTIMIZE must not silently drop point-lookup pruning: after
    compact(), every live file carries a rebuilt bloom entry and
    skipped_files_bloom still prunes (VERDICT r8 item 3)."""
    t = _bloomed_table(spark, tmp_path / "t")
    kept0, total0 = t.skipped_files_bloom("k", 1234)
    assert kept0 < total0
    t.compact(target_file_mb=1)
    mf = t._read_manifest(t.latest_version())
    assert set((mf.blooms or {}).get("k") or {}) >= set(mf.files)
    # the rewritten files' blooms are FRESH, not dropped: an absent key
    # prunes every file (pre-fix, rewritten files had no entry and were
    # conservatively kept — pruning silently gone until build_bloom)
    kept1, _total1 = t.skipped_files_bloom("k", 10**9)
    assert kept1 == 0
    assert [r["k"] for r in t.read_point("k", 1234).collect()] == [1234]
    assert t.read_point("k", 10**9).count() == 0


def test_bloom_survives_zorder(spark, tmp_path):
    t = _bloomed_table(spark, tmp_path / "t")
    t.optimize_zorder("k", "g", n_files=4)
    mf = t._read_manifest(t.latest_version())
    assert set((mf.blooms or {}).get("k") or {}) >= set(mf.files)
    kept, total = t.skipped_files_bloom("k", 77)
    assert kept < total
    assert [r["k"] for r in t.read_point("k", 77).collect()] == [77]


def test_bloom_survives_update_and_dv_purge(spark, tmp_path):
    """CoW UPDATE rewrites hit files — their blooms must reflect the
    POST-update values; a DV purge (materialize_dv) likewise reblooms
    the files it materializes."""
    t = _bloomed_table(spark, tmp_path / "t")
    # CoW update moves k=1234 to k=5001234
    t.update_where("k = 1234", {"k": "5001234"})
    assert t.read_point("k", 1234).count() == 0
    assert t.read_point("k", 5001234).count() == 1
    mf = t._read_manifest(t.latest_version())
    assert set((mf.blooms or {}).get("k") or {}) >= set(mf.files)
    # the rewritten file's bloom now matches the new value: probing the
    # new key keeps few files, not everything
    kept, total = t.skipped_files_bloom("k", 5001234)
    assert kept < total
    # MoR delete + purge: rewritten survivors get fresh blooms
    t.delete_where_dv(F.col("k") % 2 == 0)
    v = t.materialize_dv(min_mask_ratio=0.01)
    assert v is not None
    mf = t._read_manifest(v)
    assert set((mf.blooms or {}).get("k") or {}) >= set(mf.files)
    assert t.read_point("k", 77).count() == 1  # odd key survives
    assert t.read_point("k", 78).count() == 0  # even key deleted


def test_bloom_covers_mor_update_images(spark, tmp_path):
    """update_where_dv appends image files — they get bloom entries in
    the same commit, so read_point prunes on the NEW values too."""
    t = _bloomed_table(spark, tmp_path / "t")
    t.update_where_dv("k = 42", {"k": "7000042"})
    mf = t._read_manifest(t.latest_version())
    assert set((mf.blooms or {}).get("k") or {}) == set(mf.files)
    assert t.read_point("k", 42).count() == 0
    assert [r["k"] for r in t.read_point("k", 7000042).collect()] == [
        7000042
    ]
    kept, total = t.skipped_files_bloom("k", 7000042)
    assert kept < total


def test_bloom_survives_merge_cow(spark, tmp_path):
    t = _bloomed_table(spark, tmp_path / "t", n=1000, files=4)
    src = spark.createDataFrame(
        [(500, 999), (9999, 1)], "k long, g long"
    )
    t.merge(src, keys=["k"])
    mf = t._read_manifest(t.latest_version())
    assert set((mf.blooms or {}).get("k") or {}) >= set(mf.files)
    assert t.read_point("k", 9999).count() == 1
    assert [r["g"] for r in t.read_point("k", 500).collect()] == [999]


# ----------------------------------------------------------------------
# VERDICT r8 item 2: CDF update pre/post images (Delta parity)
# ----------------------------------------------------------------------


def test_change_feed_update_images(spark, tmp_path):
    """Batch change_feed: DV-backed UPDATE and MERGE commits surface
    update_preimage/update_postimage rows (never delete+insert pairs);
    merge source-only keys stay plain inserts; CoW deletes stay
    deletes; keyed replay reconstructs the final snapshot."""
    from fefal_etl_spark.table import TransactionalTable

    t = TransactionalTable(spark, str(tmp_path / "t"))
    t.overwrite(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
            "k int, s string, v double",
        ).repartition(2)
    )  # v0
    t.update_where_dv("k = 2", {"v": "999"})  # v1
    t.merge_dv(
        spark.createDataFrame(
            [(3, "cc", 333.0), (4, "d", 44.0)], "k int, s string, v double"
        ),
        keys=["k"],
    )  # v2
    t.delete_where_dv("k = 1")  # v3
    feed = t.change_feed(0, 3)
    got = {
        (r["k"], r["_change_type"], r["_commit_version"]): (r["s"], r["v"])
        for r in feed.filter("_commit_version > 0").collect()
    }
    assert got == {
        (2, "update_preimage", 1): ("b", 20.0),
        (2, "update_postimage", 1): ("b", 999.0),
        (3, "update_preimage", 2): ("c", 30.0),
        (3, "update_postimage", 2): ("cc", 333.0),
        (4, "insert", 2): ("d", 44.0),
        (1, "delete", 3): ("a", 10.0),
    }
    # keyed replay: postimages/inserts add, preimages/deletes remove
    full = t.change_feed(-1, 3)
    sig = (
        full.select(
            "k",
            F.when(
                F.col("_change_type").isin("insert", "update_postimage"),
                1,
            )
            .otherwise(-1)
            .alias("d"),
        )
        .groupBy("k")
        .agg(F.sum("d").alias("n"))
    )
    live = sorted(r["k"] for r in sig.filter("n = 1").collect())
    assert live == sorted(r["k"] for r in t.read().collect())


def test_change_feed_cow_update_images_gated_by_property(spark, tmp_path):
    """With table property cdf.images=true a copy-on-write UPDATE
    records explicit change-data image files (advice r9, Delta's
    ``_change_data`` + ``delta.enableChangeDataFeed`` shape) — the
    feed emits exactly the update_pre/postimage pair for the matched
    row and NOTHING for the survivors. WITHOUT the property (the
    default — no CDC consumer should pay the O(changed rows) extra
    write) the feed keeps the documented Delta-without-CDF behavior:
    whole-file delete+insert."""
    from fefal_etl_spark.table import TransactionalTable

    # default: full-diff degeneration, no extra write
    t0 = TransactionalTable(spark, str(tmp_path / "plain"))
    t0.overwrite(
        spark.createDataFrame([(1, 10.0), (2, 20.0)], "k int, v double")
        .coalesce(1)
    )
    t0.update_where("k = 1", {"v": "111"})
    types = {r["_change_type"] for r in t0.change_feed(0, 1).collect()}
    assert types == {"insert", "delete"}

    # property on: exact images, nothing for survivors
    t = TransactionalTable(spark, str(tmp_path / "t"))
    t.overwrite(
        spark.createDataFrame([(1, 10.0), (2, 20.0)], "k int, v double")
        .coalesce(1)
    )
    t.set_property("cdf.images", "true")  # v1
    t.update_where("k = 1", {"v": "111"})  # v2
    got = {
        (r["k"], r["_change_type"]): r["v"]
        for r in t.change_feed(1, 2).collect()
    }
    assert got == {
        (1, "update_preimage"): 10.0,
        (1, "update_postimage"): 111.0,
    }


@_posix_log
def test_changes_stream_update_images(spark, tmp_path):
    """The streaming CDF source carries the same Delta-parity labels:
    update_where_dv → one preimage + one postimage row per updated
    row, in the same commit."""
    from fefal_etl_spark.streaming.table_source import (
        TxnTableChangesDataSource,
    )
    from fefal_etl_spark.table import TransactionalTable

    spark.dataSource.register(TxnTableChangesDataSource)
    root = str(tmp_path / "t")
    t = TransactionalTable(spark, root)
    t.overwrite(spark.range(10).select(F.col("id").alias("k")))
    t.update_where_dv("k = 7", {"k": "700"})
    df = (
        spark.readStream.format("txn_table_changes")
        .option("path", root)
        .load()
    )
    q = (
        df.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    r = spark.read.parquet(str(tmp_path / "out"))
    v1 = {
        (x["k"], x["_change_type"])
        for x in r.filter("_commit_version = 1").collect()
    }
    assert v1 == {(7, "update_preimage"), (700, "update_postimage")}


# ----------------------------------------------------------------------
# VERDICT r8 item 4: SQL-text DML dispatcher
# ----------------------------------------------------------------------


def test_execute_sql_update_delete_merge(spark, tmp_path):
    """execute_sql maps ANSI UPDATE/DELETE/MERGE/SELECT text onto the
    table verbs; WHERE text reaches the verbs' pruned discovery; the
    unsupported surface raises SqlDmlError instead of mis-executing."""
    from fefal_etl_spark.sql_dml import SqlDmlError, execute_sql
    from fefal_etl_spark.table import TransactionalTable

    t = TransactionalTable(spark, str(tmp_path / "t"))
    t.overwrite(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
            "k int, s string, v double",
        ).repartition(2)
    )
    v = execute_sql(
        spark, "UPDATE t SET v = v * 2, s = upper(s) WHERE k <= 2",
        {"t": t},
    )
    assert v == 1
    assert sorted((r["k"], r["s"], r["v"]) for r in t.read().collect()) == [
        (1, "A", 20.0), (2, "B", 40.0), (3, "c", 30.0)
    ]
    # string literal containing WHERE/commas must not confuse the parser
    execute_sql(
        spark,
        "UPDATE t SET s = 'x, WHERE = ''y''' WHERE k = 3",
        {"t": t},
    )
    assert [
        r["s"] for r in t.read().filter("k = 3").collect()
    ] == ["x, WHERE = 'y'"]
    execute_sql(spark, "DELETE FROM t WHERE k = 2", {"t": t})
    assert sorted(r["k"] for r in t.read().collect()) == [1, 3]
    src = spark.createDataFrame(
        [(3, "cc", 333.0), (9, "z", 99.0)], "k int, s string, v double"
    )
    execute_sql(
        spark,
        "MERGE INTO t USING s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET v = s.v "
        "WHEN NOT MATCHED THEN INSERT *",
        {"t": t, "s": src},
    )
    got = sorted((r["k"], r["s"], r["v"]) for r in t.read().collect())
    # update_cols=[v]: matched row keeps its own s, takes source v
    assert got == [(1, "A", 20.0), (3, "x, WHERE = 'y'", 333.0), (9, "z", 99.0)]
    # SELECT returns a DataFrame over the registered views
    n = execute_sql(
        spark, "SELECT count(*) AS n FROM t WHERE v > 50", {"t": t}
    ).collect()[0]["n"]
    assert n == 2
    # MoR routing: DELETE via deletion vectors, no data-file rewrite
    before = set(t._read_manifest(t.latest_version()).files)
    execute_sql(spark, "DELETE FROM t WHERE k = 9", {"t": t}, mor=True)
    mf = t._read_manifest(t.latest_version())
    assert before <= set(mf.files) and mf.dv_files
    assert sorted(r["k"] for r in t.read().collect()) == [1, 3]
    # loud rejections, nothing committed
    vbase = t.latest_version()
    for bad in (
        "DROP TABLE t",
        "MERGE INTO t USING s ON t.k < s.k WHEN MATCHED THEN UPDATE "
        "SET * WHEN NOT MATCHED THEN INSERT *",
        "MERGE INTO t USING s ON t.k = s.k WHEN MATCHED THEN DELETE",
        "UPDATE nope SET v = 1",
    ):
        with pytest.raises(SqlDmlError):
            execute_sql(spark, bad, {"t": t, "s": src})
    assert t.latest_version() == vbase


@_posix_log
@pytest.mark.slow
def test_cli_sql_statement(spark, tmp_path):
    """The CLI `sql` subcommand binds NAME=ROOT tables and executes the
    statement (scheduler-invocable, like the maintenance verbs). Runs
    in a subprocess: the CLI owns and STOPS its SparkSession, so it
    must not share the test fixture's."""
    import subprocess
    import sys

    from fefal_etl_spark.table import TransactionalTable

    root = str(tmp_path / "t")
    t = TransactionalTable(spark, root)
    t.overwrite(
        spark.createDataFrame([(1, 10.0), (2, 20.0)], "k int, v double")
    )
    proc = subprocess.run(
        [
            sys.executable, "-m", "fefal_etl_spark", "sql",
            "UPDATE t SET v = 99 WHERE k = 1", "--table", f"t={root}",
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert '"version": 1' in proc.stdout
    assert sorted((r["k"], r["v"]) for r in t.read().collect()) == [
        (1, 99.0), (2, 20.0)
    ]


# ----------------------------------------------------------------------
# VERDICT r8 item 6: partition evolution (Iceberg spec evolution)
# ----------------------------------------------------------------------


def _evo_df(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"r{i % 2}", f"d{i % 3}", float(i)) for i in range(lo, hi)],
        "k int, region string, day string, v double",
    )


def test_partition_evolution_mixed_spec(spark, tmp_path):
    """set_partition_spec: old files stay readable under their own
    recorded spec, new appends land under the new one, pruning applies
    per-file values on BOTH specs, and an explicit layout mismatch
    raises instead of quietly undoing the evolution."""
    from fefal_etl_spark.table import TransactionalTable

    t = TransactionalTable(spark, str(tmp_path / "t"))
    t.overwrite(_evo_df(spark, 0, 30), partition_by=["day"])  # day spec
    assert t.current_partition_spec() == ["day"]
    t.set_partition_spec(["day", "region"])
    assert t.current_partition_spec() == ["day", "region"]
    t.append(_evo_df(spark, 100, 106))  # defaults to the NEW spec
    mf = t._read_manifest(t.latest_version())
    new_spec = [f for f in mf.files if "region=" in f]
    old_spec = [f for f in mf.files if "region=" not in f]
    assert new_spec and old_spec  # genuinely mixed
    # mixed-spec read: all rows, correct values from both layouts
    assert t.read().count() == 36
    assert {r["k"] for r in t.read_partition(day="d1").collect()} == {
        i for i in range(30) if i % 3 == 1
    } | {i for i in range(100, 106) if i % 3 == 1}
    # pruning on the OLD spec column prunes both file generations
    kept, total = t.pruned_partition_files(day="d1")
    assert kept < total
    # pruning on the NEW spec column prunes new-gen files; old-gen
    # files lack the value and are conservatively kept
    kept_new, _ = t.pruned_partition_files(region="r0")
    assert kept_new == len(old_spec) + sum(
        1 for f in new_spec if "region=r0" in f
    )
    assert {r["k"] for r in t.read_partition(region="r0").collect()} == {
        i for i in range(30) if i % 2 == 0
    } | {i for i in range(100, 106) if i % 2 == 0}
    # an explicit mismatching layout raises
    with pytest.raises(ValueError, match="partition spec"):
        t.append(_evo_df(spark, 200, 201), partition_by=["day"])
    # OPTIMIZE is the lazy migration: everything converges to the
    # new spec; partition pruning on region now prunes for real
    t.compact(target_file_mb=1)
    mf = t._read_manifest(t.latest_version())
    assert all("region=" in f and "day=" in f for f in mf.files)
    assert t.read().count() == 36
    kept, total = t.pruned_partition_files(region="r1")
    assert kept < total
    # a fresh handle resolves the spec from the log (replay parity)
    t2 = TransactionalTable(spark, str(tmp_path / "t"))
    assert t2.current_partition_spec() == ["day", "region"]


def test_partition_evolution_to_unpartitioned_and_overwrite(spark, tmp_path):
    from fefal_etl_spark.table import TransactionalTable

    t = TransactionalTable(spark, str(tmp_path / "t"))
    t.overwrite(_evo_df(spark, 0, 12), partition_by=["day"])
    t.set_partition_spec([])  # evolve to unpartitioned
    t.append(_evo_df(spark, 100, 103))
    mf = t._read_manifest(t.latest_version())
    assert any("day=" not in f for f in mf.files)  # new files layout-less
    assert t.read().count() == 15
    # a wholesale overwrite REDEFINES a declared spec
    t.overwrite(_evo_df(spark, 0, 6), partition_by=["region"])
    assert t.current_partition_spec() == ["region"]
    t.append(_evo_df(spark, 50, 53))
    mf = t._read_manifest(t.latest_version())
    assert all("region=" in f for f in mf.files)
    # unknown columns rejected
    with pytest.raises(ValueError, match="not in the recorded schema"):
        t.set_partition_spec(["nope"])


@_posix_log
def test_sink_validates_against_declared_spec(txn_format, tmp_path):
    """After evolution the sink's layout check compares against the
    DECLARED spec, not the legacy whole-file-map inference — streaming
    appends under the new layout are accepted while the table still
    holds old-spec files."""
    from fefal_etl_spark.table import TransactionalTable

    spark = txn_format
    root = str(tmp_path / "t")
    t = TransactionalTable(spark, root)
    t.overwrite(_evo_df(spark, 0, 12), partition_by=["day"])
    t.set_partition_spec(["day", "region"])
    # old layout now rejected...
    with pytest.raises(Exception, match="partition layout"):
        _evo_df(spark, 100, 103).coalesce(1).write.format(
            "txn_table"
        ).mode("append").option("partitionBy", "day").save(root)
    # ...new layout accepted even though old-spec files dominate
    _evo_df(spark, 100, 103).coalesce(1).write.format("txn_table").mode(
        "append"
    ).option("partitionBy", "day,region").save(root)
    assert t.read().count() == 15


# ----------------------------------------------------------------------
# VERDICT r8 item 5: multi-PROCESS commit race (real hard-link CAS)
# ----------------------------------------------------------------------

_RACE_WORKER = r"""
import sys, time, random

role, root, ident = sys.argv[1], sys.argv[2], int(sys.argv[3])

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[2]")
    .appName(f"race-{role}-{ident}")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.driver.memory", "1g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
sys.path.insert(0, "REPO_ROOT")
from fefal_etl_spark.table import CommitConflict, TransactionalTable

t = TransactionalTable(spark, root)
random.seed(ident)
if role == "append":
    for j in range(5):
        keys = [(ident * 1000 + j * 10 + x, float(ident)) for x in range(5)]
        t.append(spark.createDataFrame(keys, "k long, v double"))
        time.sleep(random.random() * 0.05)
    print("OK append", ident)
elif role == "compact":
    done = 0
    for _ in range(8):
        try:
            t.compact(target_file_mb=1)
            done += 1
        except CommitConflict:
            pass
        time.sleep(random.random() * 0.1)
    print("OK compact", done)
elif role == "merge":
    # negative keys: provably disjoint from every append's key range,
    # so losing a race to an append REBASES (V150 narrowing)
    ok = 0
    for j in range(4):
        src = spark.createDataFrame(
            [(-1 - j, 900.0 + j), (-100 - j, 901.0 + j)], "k long, v double"
        )
        for _attempt in range(30):
            try:
                t.merge_dv(src, keys=["k"])
                ok += 1
                break
            except CommitConflict:
                time.sleep(random.random() * 0.1)
        time.sleep(random.random() * 0.05)
    print("OK merge", ok)
spark.stop()
"""


@_posix_log
@pytest.mark.slow
def test_multiprocess_commit_race(spark, tmp_path):
    """≥4 real OS processes (own JVMs, own Python, shared NOTHING but
    the table directory) fight over one table with mixed
    append/compact/merge traffic through the hard-link CAS. Afterwards:
    every landed commit is linearizable — no append lost, no row
    duplicated, every merge image applied exactly once, every version
    resolvable. (All prior concurrency tests were thread-based in one
    process; this is the real-fight version — VERDICT r8 item 5.)"""
    import subprocess
    import sys

    from fefal_etl_spark.table import TransactionalTable

    root = str(tmp_path / "t")
    t = TransactionalTable(spark, root)
    t.overwrite(
        spark.createDataFrame(
            [(-1 - j, 0.0) for j in range(4)]
            + [(-100 - j, 0.0) for j in range(4)],
            "k long, v double",
        )
    )
    script = tmp_path / "worker.py"
    script.write_text(
        _RACE_WORKER.replace("REPO_ROOT", os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)
        )))
    )
    jobs = [("append", 1), ("append", 2), ("append", 3),
            ("compact", 0), ("merge", 0)]
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), role, root, str(ident)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for role, ident in jobs
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=480)
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, (out, err[-3000:])
        assert "OK" in out
    # the merge worker must have landed all 4 merges (rebase, not fail)
    merge_out = outs[4][1]
    assert "OK merge 4" in merge_out, merge_out
    # linearizable outcome: 3 appenders x 5 batches x 5 rows, each
    # exactly once; merge images applied (latest j wins per key)
    rows = {r["k"]: r["v"] for r in t.read().collect()}
    appended = [k for k in rows if k >= 1000]
    assert len(appended) == 75
    for ident in (1, 2, 3):
        mine = [k for k in appended if k // 1000 == ident]
        assert len(mine) == 25
        assert all(rows[k] == float(ident) for k in mine)
    assert rows[-1] == 900.0  # j=0 targets -1
    assert rows[-4] == 903.0  # j=3 targets -4
    assert rows[-103] == 904.0  # j=3 targets -103
    # every committed version resolves and replays
    vs = t.versions()
    assert vs == list(range(len(vs)))
    for v in vs[-5:]:
        t._read_manifest(v)
    # no duplicated rows anywhere
    assert t.read().count() == len(rows)


# ----------------------------------------------------------------------
# round-9 review fixes: generated+spec appends, restore spec rewind,
# merge_dv empty legs / hive-laid images
# ----------------------------------------------------------------------


def test_spec_evolution_on_generated_table(spark, tmp_path):
    """A hidden-partitioned (generated) table stays spec-evolvable: a
    default-layout append derives the transform column AND lands under
    the evolved spec instead of raising (review r9)."""
    from fefal_etl_spark.table import TransactionalTable

    t = TransactionalTable(spark, str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(i, f"2024-01-{(i % 3) + 1:02d} 10:00:00", f"r{i % 2}", float(i))
         for i in range(12)],
        "k int, ts string, region string, v double",
    ).selectExpr("k", "CAST(ts AS TIMESTAMP) AS ts", "region", "v")
    t.overwrite(df, generated={"day": "to_date(ts)"})
    t.set_partition_spec(["day", "region"])
    t.append(df.limit(3))  # must derive `day` AND use the new spec
    mf = t._read_manifest(t.latest_version())
    latest_files = [
        f for f in mf.files if f not in t._read_manifest(1).files
    ]
    assert latest_files and all(
        "day=" in f and "region=" in f for f in latest_files
    )
    assert t.read().count() == 15


def test_restore_rewinds_partition_spec(spark, tmp_path):
    """restore() rewinds the declared spec with the data — including
    back to never-declared (review r9)."""
    from fefal_etl_spark.table import TransactionalTable

    t = TransactionalTable(spark, str(tmp_path / "t"))
    t.overwrite(_evo_df(spark, 0, 6), partition_by=["day"])  # v0, no spec
    t.set_partition_spec(["region"])  # v1
    assert t.current_partition_spec() == ["region"]
    t.restore(0)  # v2: spec resets to never-declared
    mf = t._read_manifest(t.latest_version())
    assert mf.partition_spec is None
    assert t.current_partition_spec() == ["day"]  # legacy inference again
    t.set_partition_spec(["region"])  # v3
    t.overwrite(_evo_df(spark, 0, 6), partition_by=["day"])  # v4 redefines
    assert t.current_partition_spec() == ["day"]
    t.restore(3)  # back to the ['region'] declaration
    assert t.current_partition_spec() == ["region"]
    # fresh handle agrees (replay parity, incl. the null reset record)
    t2 = TransactionalTable(spark, str(tmp_path / "t"))
    assert t2.current_partition_spec() == ["region"]


def test_merge_dv_no_empty_files_and_layout(spark, tmp_path):
    """A pure-insert merge_dv stages no empty sidecar and no empty
    update leg; on a partitioned table the image files keep the hive
    layout (review r9)."""
    from fefal_etl_spark.table import TransactionalTable

    t = TransactionalTable(spark, str(tmp_path / "t"))
    t.overwrite(_evo_df(spark, 0, 12), partition_by=["day"])
    v0_files = set(t._read_manifest(0).files)
    # pure-insert merge: nothing matched
    t.merge_dv(_evo_df(spark, 100, 103), keys=["k"])
    mf = t._read_manifest(t.latest_version())
    assert not mf.dv_files  # no empty sidecar staged
    added = [f for f in mf.files if f not in v0_files]
    assert added and all("day=" in f for f in added)  # hive-laid images
    # no zero-row data file landed
    import pyarrow.parquet as pq

    for f in added:
        assert pq.ParquetFile(
            os.path.join(str(tmp_path / "t"), f)
        ).metadata.num_rows > 0
    # matched+insert merge on the same table: update images hive-laid,
    # CDF labels intact
    t.merge_dv(
        spark.createDataFrame(
            [(0, "r0", "d0", 999.0), (200, "r0", "d0", 1.0)],
            "k int, region string, day string, v double",
        ),
        keys=["k"],
    )
    v = t.latest_version()
    feed = t.change_feed(v - 1, v)
    got = {
        (r["k"], r["_change_type"]) for r in feed.collect()
    }
    assert got == {
        (0, "update_preimage"),
        (0, "update_postimage"),
        (200, "insert"),
    }
