"""Round-6 table-layer work (VERDICT r5 items 1 and 4): checkpointed
delta commit log — commit payload O(changed files), resolution reads
checkpoint + tail — and partition-disjoint conflict narrowing for
concurrent writers."""

import json
import os
import threading

import pytest

# Tests below marked `_posix_log` inspect the on-disk commit log or read
# it through a DataSource worker process; with FEFAL_TABLE_BACKEND=memory
# (the round-8 in-memory log certification run) the log never touches the
# filesystem, so they are skipped with an explicit reason — the same
# constraint as Delta: every log reader needs access to the log store.
_posix_log = pytest.mark.skipif(
    os.environ.get("FEFAL_TABLE_BACKEND") == "memory",
    reason="needs the commit log on the filesystem (disk artifact "
    "inspection or DataSource worker-side log reads)",
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# ----------------------------------------------------------------------
# O(delta) commit records + checkpoint resolution (VERDICT r5 item 1)
# ----------------------------------------------------------------------


@_posix_log
@pytest.mark.slow
def test_append_record_payload_is_o_delta(spark, tmp_path):
    """The commit record of the Nth append must list ONLY that append's
    files — its payload does not grow with the table's file count (the
    r5 scale ceiling: absolute manifests made commit cost O(total
    files))."""
    from fefal_etl_spark.table import TransactionalTable, _load_record

    root = str(tmp_path / "t")
    t = TransactionalTable(spark, root)
    n_appends = 15
    for i in range(n_appends):
        t.append(
            spark.createDataFrame([(i, f"v{i}")], "k int, v string").coalesce(1)
        )
    sizes = []
    for v in range(n_appends):
        rec = _load_record(root, v)
        assert "files" not in rec, "commit record must be a delta"
        assert len(rec["add"]) == 1
        assert rec.get("remove", []) == []
        sizes.append(
            os.path.getsize(
                os.path.join(root, "_manifests", f"manifest-{v}.json")
            )
        )
    # the last record is no bigger than the first (± JSON noise): the
    # payload is flat in table size
    assert sizes[-1] <= sizes[0] * 1.5, sizes
    # the resolved snapshot still accumulates all files
    assert len(t._read_manifest(n_appends - 1).files) == n_appends
    assert t.read().count() == n_appends


@_posix_log
@pytest.mark.slow
def test_checkpoint_written_and_used(spark, tmp_path):
    """Every CHECKPOINT_INTERVAL commits a full-state checkpoint lands;
    a FRESH handle resolving the latest snapshot reads checkpoint +
    tail (pinned by deleting the pre-checkpoint records: resolution
    must not need them)."""
    from fefal_etl_spark.table import TransactionalTable

    root = str(tmp_path / "t")
    t = TransactionalTable(spark, root)
    for i in range(13):  # versions 0..12 — checkpoint at 10
        t.append(spark.createDataFrame([(i,)], "k int").coalesce(1))
    cp = os.path.join(root, "_manifests", "checkpoint-10.json")
    assert os.path.exists(cp)
    with open(os.path.join(root, "_manifests", "_last_checkpoint")) as f:
        assert json.load(f)["version"] == 10
    with open(cp) as f:
        state = json.load(f)
    assert len(state["files"]) == 11  # full state at v10
    # records strictly below the checkpoint are not needed to resolve
    # any version >= 10
    for v in range(0, 10):
        os.unlink(os.path.join(root, "_manifests", f"manifest-{v}.json"))
    fresh = TransactionalTable(spark, root)
    assert fresh.read(12).count() == 13
    assert fresh.read(10).count() == 11
    assert len(fresh._read_manifest(11).files) == 12


def test_fresh_handle_resolution_matches_writer_state(spark, tmp_path):
    """Replay (fresh handle, no in-memory cache) must reconstruct the
    same snapshot the writing handle cached — across appends, a DV
    delete, a bloom build, schema evolution and a restore."""
    from pyspark.sql import functions as F

    from fefal_etl_spark.table import TransactionalTable

    root = str(tmp_path / "t")
    t = TransactionalTable(spark, root)
    t.overwrite(
        spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, v string")
    )
    t.append(spark.createDataFrame([(4, "d")], "k int, v string"))
    t.delete_where_dv(F.col("k") == 2)
    t.build_bloom("k")
    t.append(
        spark.createDataFrame([(5, "e", 1.5)], "k int, v string, w double")
    )
    v_before_restore = t.latest_version()
    t.restore(1)
    writer_mf = t._read_manifest(t.latest_version())
    fresh = TransactionalTable(spark, root)
    fresh_mf = fresh._read_manifest(fresh.latest_version())
    assert fresh_mf.files == writer_mf.files
    assert fresh_mf.dv_files == writer_mf.dv_files
    assert (fresh_mf.stats or {}) == (writer_mf.stats or {})
    assert (fresh_mf.schema or {}) == (writer_mf.schema or {})
    # the evolved column `w` survives restore in the DECLARED schema
    # (restore re-points data, the schema history stands) — and since
    # round 12 reads honor the declaration, the restored rows surface
    # it as typed NULLs instead of silently disagreeing with DESCRIBE
    assert _rows(fresh.read()) == [
        (1, "a", None),
        (2, "b", None),
        (3, "c", None),
        (4, "d", None),
    ]
    # pre-restore snapshot still resolves (time travel over the delta log)
    assert fresh.read(v_before_restore).filter(
        F.col("k") == 2
    ).count() == 0  # DV applied there


@_posix_log
def test_vacuum_checkpoints_before_trimming_log(spark, tmp_path):
    """vacuum() must leave the kept tail resolvable even though the
    delta records below it are gone — it writes a checkpoint at the
    oldest kept version first."""
    from fefal_etl_spark.table import TransactionalTable

    root = str(tmp_path / "t")
    t = TransactionalTable(spark, root)
    for i in range(6):
        t.append(spark.createDataFrame([(i,)], "k int").coalesce(1))
    t.vacuum(keep_versions=2)
    assert t.versions() == [4, 5]
    fresh = TransactionalTable(spark, root)
    assert fresh.read(4).count() == 5
    assert fresh.read(5).count() == 6
    assert os.path.exists(
        os.path.join(root, "_manifests", "checkpoint-4.json")
    )
    # history over the kept tail still works
    assert [r["version"] for r in fresh.history().collect()] == [4, 5]


@_posix_log
def test_pre_checkpoint_absolute_manifests_still_resolve(spark, tmp_path):
    """Upgrade path: a table whose early commits are pre-r6 ABSOLUTE
    manifests (full ``files`` list) mixes with new delta records — the
    replay treats an absolute record as a full-state reset."""
    from fefal_etl_spark.table import TransactionalTable, _load_record

    root = str(tmp_path / "t")
    t = TransactionalTable(spark, root)
    t.overwrite(spark.createDataFrame([(1,), (2,)], "k int"))
    t.append(spark.createDataFrame([(3,)], "k int"))
    # rewrite records 0 and 1 into the legacy absolute form
    mf1 = t._read_manifest(1)
    for v in (0, 1):
        mf = t._read_manifest(v)
        legacy = {
            "version": v,
            "op": mf.op,
            "files": mf.files,
            "parent": mf.parent,
            "ts": mf.ts,
        }
        if mf.stats:
            legacy["stats"] = mf.stats
        if mf.schema:
            legacy["schema"] = mf.schema
        path = os.path.join(root, "_manifests", f"manifest-{v}.json")
        os.unlink(path)
        with open(path, "w") as f:
            json.dump(legacy, f)
    fresh = TransactionalTable(spark, root)
    fresh.append(spark.createDataFrame([(4,)], "k int"))  # delta record
    assert "add" in _load_record(root, 2)
    assert _rows(fresh.read()) == [(1,), (2,), (3,), (4,)]
    assert fresh._read_manifest(1).files == mf1.files


# ----------------------------------------------------------------------
# partition-disjoint conflict narrowing (VERDICT r5 item 4)
# ----------------------------------------------------------------------


def _part_table(spark, root):
    from pyspark.sql import functions as F

    from fefal_etl_spark.table import TransactionalTable

    t = TransactionalTable(spark, root)
    df = spark.range(20).select(
        (F.col("id") % 4).cast("string").alias("p"),
        F.col("id").alias("v"),
    )
    t.overwrite(df, partition_by=["p"])
    return t


def test_disjoint_partition_writers_both_commit(spark, tmp_path):
    """Two writers overwriting DIFFERENT partitions concurrently must
    BOTH succeed (one rebases onto the other); the final table holds
    both writers' data plus the untouched partitions."""
    from fefal_etl_spark.table import TransactionalTable

    root = str(tmp_path / "t")
    _part_table(spark, root)
    results, errors = {}, []

    def writer(pval: str, base_v: int):
        try:
            h = TransactionalTable(spark, root)
            df = spark.createDataFrame(
                [(1000 + int(pval),)], "v bigint"
            )
            results[pval] = h.overwrite_partition(df, p=pval)
        except Exception as e:  # pragma: no cover - fails the assert below
            errors.append(e)

    ts = [
        threading.Thread(target=writer, args=("1", 0)),
        threading.Thread(target=writer, args=("2", 0)),
    ]
    for th in ts:
        th.start()
    for th in ts:
        th.join()
    assert not errors
    assert sorted(results.values()) == [1, 2]
    t = TransactionalTable(spark, root)
    final = {
        (str(r["p"]), r["v"]) for r in t.read().collect()
    }  # hive path reconstruction may infer p as int — compare as str
    assert ("1", 1001) in final and ("2", 1002) in final
    # untouched partitions intact, replaced partitions fully replaced
    assert sum(1 for p, _ in final if p == "0") == 5
    assert sum(1 for p, _ in final if p == "1") == 1
    assert sum(1 for p, _ in final if p == "2") == 1


def test_overlapping_partition_writers_still_conflict(spark, tmp_path):
    """Same-partition interleaving is a REAL conflict: the slower
    writer must raise CommitConflict, not silently clobber."""
    from fefal_etl_spark.table import CommitConflict, TransactionalTable

    root = str(tmp_path / "t")
    t1 = _part_table(spark, root)
    t2 = TransactionalTable(spark, root)
    base = t1.latest_version()
    t1.overwrite_partition(
        spark.createDataFrame([(111,)], "v bigint"), p="1"
    )
    # t2 staged against the old base and targets the SAME partition
    t2._snap_cache.clear()

    # drive the race deterministically: t2 computes against `base` by
    # monkey-free means — its first _commit attempt sees the stale base
    from pyspark.sql import functions as F  # noqa: F401

    with pytest.raises(CommitConflict):
        # force the stale base: overwrite_partition reads latest itself,
        # so emulate the interleave by committing from a handle whose
        # base was captured before t1's commit
        orig = TransactionalTable.latest_version
        calls = {"n": 0}

        def stale_once(self):
            calls["n"] += 1
            if calls["n"] == 1:
                return base
            return orig(self)

        TransactionalTable.latest_version = stale_once
        try:
            t2.overwrite_partition(
                spark.createDataFrame([(222,)], "v bigint"), p="1"
            )
        finally:
            TransactionalTable.latest_version = orig


def test_disjoint_rebase_rejects_dv_interleave(spark, tmp_path):
    """A deletion-vector commit can mask rows in ANY file, so it is
    never narrowing-compatible: an interleaved DV delete must conflict
    even if the probe targets another partition."""
    from pyspark.sql import functions as F

    from fefal_etl_spark.table import CommitConflict, TransactionalTable

    root = str(tmp_path / "t")
    t1 = _part_table(spark, root)
    t2 = TransactionalTable(spark, root)
    base = t1.latest_version()
    t1.delete_where_dv(F.col("v") == 0)

    orig = TransactionalTable.latest_version
    calls = {"n": 0}

    def stale_once(self):
        calls["n"] += 1
        if calls["n"] == 1:
            return base
        return orig(self)

    TransactionalTable.latest_version = stale_once
    try:
        with pytest.raises(CommitConflict):
            t2.overwrite_partition(
                spark.createDataFrame([(999,)], "v bigint"), p="3"
            )
    finally:
        TransactionalTable.latest_version = orig


# ----------------------------------------------------------------------
# round-6 stretch: replaceWhere predicates, generated partition columns,
# n-column z-order
# ----------------------------------------------------------------------


def test_overwrite_where_carries_untouched_files(spark, tmp_path):
    """overwrite_where must (a) replace exactly the predicate-matching
    rows, (b) carry files without matches untouched (no rewrite IO),
    (c) reject incoming rows outside the predicate."""
    from pyspark.sql import functions as F

    from fefal_etl_spark.table import TransactionalTable

    root = str(tmp_path / "t")
    t = TransactionalTable(spark, root)
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    t.overwrite(df.repartitionByRange(4, "k"))  # k-clustered files
    files0 = t._read_manifest(0).files
    # replace the k<25 region with 5 fresh rows
    repl = spark.createDataFrame(
        [(i, 1000 + i) for i in range(5)], "k bigint, v bigint"
    )
    v1 = t.overwrite_where(repl, F.col("k") < 25)
    mf1 = t._read_manifest(v1)
    carried = set(files0) & set(mf1.files)
    assert carried, "files without matching rows must be carried"
    assert len(carried) == 3  # 4 range files, only the k<25 one rewritten
    rows = {r["k"]: r["v"] for r in t.read().collect()}
    assert len(rows) == 80  # 75 survivors + 5 replacements
    assert rows[3] == 1003 and rows[30] == 60
    assert all(k >= 25 or k < 5 for k in rows)
    # replaceWhere contract: incoming rows must satisfy the predicate
    import pytest

    with pytest.raises(ValueError):
        t.overwrite_where(
            spark.createDataFrame([(99, 0)], "k bigint, v bigint"),
            F.col("k") < 25,
        )
    # NULL predicate keeps the row (SQL semantics)
    t2 = TransactionalTable(spark, str(tmp_path / "t2"))
    t2.overwrite(
        spark.createDataFrame(
            [(1, "a"), (None, "n"), (7, "b")], "k int, v string"
        )
    )
    t2.overwrite_where(
        spark.createDataFrame([(0, "z")], "k int, v string"),
        F.col("k") < 5,
    )
    assert {
        (r["k"], r["v"]) for r in t2.read().collect()
    } == {(0, "z"), (None, "n"), (7, "b")}


def test_generated_partition_columns_auto_derive(spark, tmp_path):
    """Iceberg-style hidden partitioning: the transform is TABLE
    metadata — overwrite declares it, append derives it automatically,
    partition pruning works on the generated column, and a conflicting
    redefinition is rejected."""
    import pytest
    from pyspark.sql import functions as F

    from fefal_etl_spark.table import SchemaConflict, TransactionalTable

    root = str(tmp_path / "t")
    t = TransactionalTable(spark, root)
    df = spark.createDataFrame(
        [(1, "2024-01-03", 10.0), (2, "2024-02-07", 20.0),
         (3, "2024-02-11", 30.0)],
        "k int, d string, v double",
    )
    t.overwrite(df, generated={"mth": "substring(d, 1, 7)"})
    assert t._read_manifest(0).generated == {"mth": "substring(d, 1, 7)"}
    # append WITHOUT mentioning the transform: derived automatically
    t.append(
        spark.createDataFrame([(4, "2024-01-29", 40.0)], "k int, d string, v double")
    )
    got = {(r["k"], str(r["mth"])) for r in t.read().collect()}
    assert got == {
        (1, "2024-01"), (2, "2024-02"), (3, "2024-02"), (4, "2024-01")
    }
    # manifest-side partition pruning on the generated column
    kept, total = t.pruned_partition_files(mth="2024-01")
    assert kept < total
    assert {r["k"] for r in t.read_partition(mth="2024-01").collect()} == {1, 4}
    # redefining the transform is a schema conflict
    with pytest.raises(SchemaConflict):
        t.overwrite(df, generated={"mth": "substring(d, 1, 4)"})
    # fresh handle sees the declaration (rides the checkpointed log)
    fresh = TransactionalTable(spark, root)
    assert fresh._read_manifest(fresh.latest_version()).generated == {
        "mth": "substring(d, 1, 7)"
    }


def test_zorder_multi_column_skipping(spark, tmp_path):
    """3-column Morton interleave: after optimize_zorder(a, b, c) the
    per-file stats must prune on EVERY dimension; a plain sort by `a`
    only prunes on `a`."""
    from pyspark.sql import functions as F

    from fefal_etl_spark.operators.layout import zorder_key_n
    from fefal_etl_spark.table import TransactionalTable

    import pytest

    n = 4096
    df = spark.range(n).select(
        (F.col("id") % 16).alias("a"),
        (F.expr("id div 16") % 16).alias("b"),
        (F.expr("id div 256") % 16).alias("c"),
    )
    root = str(tmp_path / "t")
    t = TransactionalTable(spark, root)
    t.overwrite(df.orderBy("a").repartitionByRange(8, "a"))
    # single-column layout: b and c interleave across every file
    for col in ("b", "c"):
        kept, total = t.skipped_files(col, 2, 3)
        assert kept == total
    t.optimize_zorder("a", "b", "c", n_files=8, bits=4)
    for col in ("a", "b", "c"):
        kept, total = t.skipped_files(col, 2, 3)
        assert kept < total, f"no skipping on {col}"
    # key-bit budget is enforced
    with pytest.raises(ValueError):
        zorder_key_n([F.col("a")] * 5, bits=16)
    # 2-col key is the n=2 specialization (golden value: a=3 (011),
    # b=5 (101) at 3 bits -> z bits b2a2 b1a1 b0a0 = 100111 = 39)
    from fefal_etl_spark.operators.layout import zorder_key

    row = (
        spark.range(1)
        .select(
            zorder_key(F.lit(3), F.lit(5), bits=3).alias("z2"),
            zorder_key_n([F.lit(3), F.lit(5)], bits=3).alias("zn"),
        )
        .collect()[0]
    )
    assert row["z2"] == row["zn"] == 39


# ----------------------------------------------------------------------
# round-6: hive-partitioned streaming sources (partition reconstruction)
# ----------------------------------------------------------------------


@_posix_log
def test_partitioned_table_stream_reconstructs_partition_column(
    spark, tmp_path
):
    """The append stream over a HIVE-partITIONED table must surface the
    partition column (path-only data) as a string column on every row,
    and keep the incremental tailing contract."""
    from pyspark.sql import functions as F

    from fefal_etl_spark.streaming.table_source import (
        TxnTableStreamDataSource,
    )
    from fefal_etl_spark.table import TransactionalTable

    spark.dataSource.register(TxnTableStreamDataSource)
    root = str(tmp_path / "t")
    t = TransactionalTable(spark, root)
    df = spark.range(12).select(
        (F.col("id") % 3).cast("string").alias("p"), F.col("id").alias("k")
    )
    t.overwrite(df, partition_by=["p"])
    stream = (
        spark.readStream.format("txn_table_stream")
        .option("path", root)
        .load()
    )
    assert "p" in stream.columns
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def drain():
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    got = {(r["p"], r["k"]) for r in spark.read.parquet(out).collect()}
    assert got == {(str(i % 3), i) for i in range(12)}
    # appends tail incrementally with their partition values
    t.append(
        spark.createDataFrame([("9", 100)], "p string, k bigint"),
        partition_by=["p"],
    )
    drain()
    got = {(r["p"], r["k"]) for r in spark.read.parquet(out).collect()}
    assert ("9", 100) in got and len(got) == 13


@_posix_log
def test_partitioned_changes_stream_carries_partition_column(
    spark, tmp_path
):
    """The CDF stream over a partitioned table: inserts and DV deletes
    both carry the reconstructed partition column."""
    from pyspark.sql import functions as F

    from fefal_etl_spark.streaming.table_source import (
        TxnTableChangesDataSource,
    )
    from fefal_etl_spark.table import TransactionalTable

    spark.dataSource.register(TxnTableChangesDataSource)
    root = str(tmp_path / "t")
    t = TransactionalTable(spark, root)
    df = spark.range(6).select(
        (F.col("id") % 2).cast("string").alias("p"), F.col("id").alias("k")
    )
    t.overwrite(df, partition_by=["p"])
    t.delete_where_dv(F.col("k") == 3)
    stream = (
        spark.readStream.format("txn_table_changes")
        .option("path", root)
        .load()
    )
    assert stream.columns[-3:] == ["p", "_change_type", "_commit_version"]
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {
        (r["_change_type"], r["p"], r["k"])
        for r in spark.read.parquet(out).collect()
    }
    assert ("insert", "1", 3) in rows
    assert ("delete", "1", 3) in rows  # the DV delete, with its partition
    assert {r for r in rows if r[0] == "insert"} == {
        ("insert", str(i % 2), i) for i in range(6)
    }


def test_materialize_dv_policy_rewrites_only_heavy_files(spark, tmp_path):
    """DV compaction policy: only files whose masked fraction meets the
    threshold are rewritten (masked rows dropped for real); lightly
    masked files keep merge-on-read; sidecars shrink to the surviving
    addresses; results are unchanged on every read path."""
    from pyspark.sql import functions as F

    from fefal_etl_spark.table import TransactionalTable

    root = str(tmp_path / "t")
    t = TransactionalTable(spark, root)
    # two files: ids 0-9 (heavily masked) and 100-199 (lightly masked)
    a = spark.range(10).select(F.col("id").alias("k")).coalesce(1)
    b = spark.range(100, 200).select(F.col("id").alias("k")).coalesce(1)
    t.overwrite(a)
    t.append(b)
    t.delete_where_dv((F.col("k") < 5) | (F.col("k") == 150))
    v_dv = t.latest_version()
    before = sorted(r["k"] for r in t.read().collect())
    assert len(before) == 104
    files_before = t._read_manifest(v_dv).files
    # 50% of file A masked, 1% of file B → only A crosses 5%
    v = t.materialize_dv(min_mask_ratio=0.05)
    assert v == v_dv + 1
    mf = t._read_manifest(v)
    # B carried untouched, A replaced
    b_file = [f for f in files_before if f in set(mf.files)]
    assert len(b_file) == 1
    assert sorted(r["k"] for r in t.read().collect()) == before
    # sidecar kept (B still masked), but A's addresses purged:
    assert mf.dv_files and t.deleted_positions() == 1
    # below-threshold call is a no-op
    assert t.materialize_dv(min_mask_ratio=0.05) is None
    # fully materializing drops the sidecars entirely
    v2 = t.materialize_dv(min_mask_ratio=0.0001)
    mf2 = t._read_manifest(v2)
    assert not mf2.dv_files and t.deleted_positions() == 0
    assert sorted(r["k"] for r in t.read().collect()) == before


def test_materialize_dv_keeps_hive_layout(spark, tmp_path):
    """Partitioned files rewritten by the DV policy are re-staged in
    hive layout — partition pruning keeps working afterwards."""
    from pyspark.sql import functions as F

    from fefal_etl_spark.table import TransactionalTable

    root = str(tmp_path / "t")
    t = TransactionalTable(spark, root)
    df = spark.range(40).select(
        (F.col("id") % 2).cast("string").alias("p"), F.col("id").alias("k")
    )
    t.overwrite(df, partition_by=["p"])
    t.delete_where_dv(F.col("k") < 10)  # ~25% of each partition
    v = t.materialize_dv(min_mask_ratio=0.05)
    assert v is not None
    mf = t._read_manifest(v)
    assert not mf.dv_files
    kept, total = t.pruned_partition_files(p="1")
    assert kept < total
    assert sorted(r["k"] for r in t.read_partition(p="1").collect()) == [
        i for i in range(11, 40, 2)
    ]


def test_eight_writer_mixed_race_disjoint_partitions(spark, tmp_path):
    """VERDICT r5 item 4 'Done' criterion — the 8-thread race extended
    with partition overwrites: 4 appenders (each into its own partition)
    race 4 partition-overwriters (each on its own partition, disjoint
    from every other writer). ALL eight must land (appends rebase by
    design; disjoint overwrites rebase by narrowing), every batch
    exactly once, and each overwritten partition must hold exactly its
    final image."""
    from pyspark.sql import functions as F

    from fefal_etl_spark.table import TransactionalTable

    root = str(tmp_path / "t")
    base = spark.range(40).select(
        (F.col("id") % 8).cast("string").alias("p"),
        F.col("id").alias("v"),
    )
    TransactionalTable(spark, root).overwrite(base, partition_by=["p"])
    errors = []

    def appender(pid: int):
        try:
            t = TransactionalTable(spark, root)
            for j in range(2):
                t.append(
                    spark.createDataFrame(
                        [(str(pid), 1000 + pid * 10 + j)], "p string, v bigint"
                    ),
                    partition_by=["p"],
                )
        except Exception as e:  # pragma: no cover
            errors.append(("append", pid, e))

    def overwriter(pid: int):
        try:
            t = TransactionalTable(spark, root)
            t.overwrite_partition(
                spark.createDataFrame([(2000 + pid,)], "v bigint"),
                p=str(pid),
            )
        except Exception as e:  # pragma: no cover
            errors.append(("overwrite", pid, e))

    import threading

    threads = [
        threading.Thread(target=appender, args=(i,)) for i in range(4)
    ] + [
        threading.Thread(target=overwriter, args=(i,)) for i in range(4, 8)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    t = TransactionalTable(spark, root)
    assert t.latest_version() == 12  # 1 overwrite + 8 appends + 4 part-ovw
    got: dict[str, set] = {}
    for r in t.read().collect():
        got.setdefault(str(r["p"]), set()).add(r["v"])
    # overwritten partitions: exactly the final image
    for pid in range(4, 8):
        assert got[str(pid)] == {2000 + pid}, (pid, got[str(pid)])
    # appended partitions: original 5 rows + both appended batches
    for pid in range(4):
        expect = {pid + 8 * i for i in range(5)} | {
            1000 + pid * 10,
            1000 + pid * 10 + 1,
        }
        assert got[str(pid)] == expect, (pid, got[str(pid)])


def test_checkpointed_log_model_based_random_ops(spark, tmp_path):
    """Model-based check of the CHECKPOINTED delta log: a seeded random
    mix of every mutation kind (append / partition overwrite / predicate
    replace / DV delete / DV materialize / compact / restore) with
    CHECKPOINT_INTERVAL=3, verified against a plain-Python model —
    every historical version reads back exactly the model state, BOTH
    through the writing handle's cache and through a fresh handle
    (pure checkpoint+tail replay), and again after a vacuum trims the
    log prefix."""
    import random

    from pyspark.sql import functions as F

    from fefal_etl_spark.table import TransactionalTable

    rng = random.Random(20260815)
    root = str(tmp_path / "t")
    t = TransactionalTable(spark, root)
    t.CHECKPOINT_INTERVAL = 3
    vcol = "v"

    def df_of(rows):
        return spark.createDataFrame(rows, f"p string, k int, {vcol} int")

    # model: k -> (p, v)
    model: dict[int, tuple[str, int]] = {
        k: (str(k % 3), k * 10) for k in range(12)
    }
    t.overwrite(
        df_of([(p, k, v) for k, (p, v) in model.items()]),
        partition_by=["p"],
    )
    history = [dict(model)]
    # logical name of the value column per version (column ops rename it;
    # the model's values are unaffected — rename is metadata-only)
    vcol_hist = ["v"]
    vcol = "v"
    n_renames = 0
    next_k = 100
    for step in range(14):
        op = rng.choice(
            ["append", "part_ovw", "repl_where", "dv_del",
             "dv_mat", "compact", "restore", "rename_col"]
        )
        if op == "append":
            rows = [
                (str(rng.randrange(3)), next_k + i, (next_k + i) * 10)
                for i in range(rng.randrange(1, 4))
            ]
            next_k += len(rows)
            t.append(df_of(rows), partition_by=["p"])
            model.update({k: (p, v) for p, k, v in rows})
        elif op == "part_ovw":
            p = str(rng.randrange(3))
            rows = [(next_k, next_k * 10), (next_k + 1, next_k * 10 + 10)]
            next_k += 2
            t.overwrite_partition(
                spark.createDataFrame(rows, f"k int, {vcol} int"), p=p
            )
            model = {k: pv for k, pv in model.items() if pv[0] != p}
            model.update({k: (p, v) for k, v in rows})
        elif op == "repl_where":
            repl = [(str(rng.randrange(3)), next_k, next_k * 10)]
            next_k += 1
            # cut above the replacement's own k so the replaceWhere
            # contract (incoming rows satisfy the predicate) holds
            cut = next_k + 1
            t.overwrite_where(df_of(repl), F.col("k") < cut)
            model = {k: pv for k, pv in model.items() if not (k < cut)}
            model.update({k: (p, v) for p, k, v in repl})
        elif op == "dv_del":
            mod = rng.choice([2, 3, 5])
            t.delete_where_dv(F.col("k") % mod == 0)
            model = {k: pv for k, pv in model.items() if k % mod != 0}
        elif op == "dv_mat":
            if t.materialize_dv(min_mask_ratio=0.01) is None:
                continue  # no version committed — model unchanged
        elif op == "compact":
            t.compact(target_file_mb=64, partition_by=["p"])
        elif op == "restore":
            target = rng.randrange(len(history))
            t.restore(target)
            model = dict(history[target])
        elif op == "rename_col":
            n_renames += 1
            new_name = f"v{n_renames}"
            t.rename_column(vcol, new_name)
            vcol = new_name  # metadata-only: model values unchanged
        history.append(dict(model))
        vcol_hist.append(vcol)
    assert t.versions() == list(range(len(history)))

    def check(handle, versions):
        for v in versions:
            name = vcol_hist[v]  # logical name AS OF that version
            got = {
                r["k"]: (str(r["p"]), r[name])
                for r in handle.read(version=v).collect()
            }
            assert got == history[v], f"version {v}"

    check(t, range(len(history)))
    fresh = TransactionalTable(spark, root)  # pure checkpoint+tail
    check(fresh, range(len(history)))
    # vacuum keeps the last 4 versions resolvable after trimming the log
    keep = t.versions()[-4:]
    t.vacuum(keep_versions=4)
    fresh2 = TransactionalTable(spark, root)
    assert fresh2.versions() == keep
    check(fresh2, keep)


# ----------------------------------------------------------------------
# round-6: zero-rewrite column rename / drop (metadata-only schema ops)
# ----------------------------------------------------------------------


def test_rename_column_zero_rewrite(spark, tmp_path):
    """rename_column must be metadata-only (identical file list), make
    old-named and new-named files read as ONE column, keep data
    skipping on the renamed column, show version-correct names under
    time travel, and retire the old name."""
    from pyspark.sql import functions as F

    from fefal_etl_spark.table import SchemaConflict, TransactionalTable

    root = str(tmp_path / "t")
    t = TransactionalTable(spark, root)
    t.overwrite(
        spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("amount")
        ).repartitionByRange(4, "k")
    )
    files0 = t._read_manifest(0).files
    v1 = t.rename_column("amount", "price")
    assert t._read_manifest(v1).files == files0  # zero rewrite
    assert "price" in t._read_manifest(v1).schema
    assert "amount" not in t._read_manifest(v1).schema
    # new-name appends coexist with old-named files
    t.append(
        spark.createDataFrame([(1000, 4242)], "k bigint, price bigint")
    )
    got = {r["k"]: r["price"] for r in t.read().collect()}
    assert got[7] == 14 and got[1000] == 4242 and len(got) == 101
    assert "amount" not in t.read().columns
    # stats moved: skipping works under the NEW name
    kept, total = t.skipped_files("price", 10, 20)
    assert kept < total
    # time travel shows the old name as of v0
    assert "amount" in t.read(0).columns and "price" not in t.read(0).columns
    # the old name is retired
    import pytest

    with pytest.raises(SchemaConflict):
        t.append(
            spark.createDataFrame([(1, 2)], "k bigint, amount bigint")
        )
    # fresh handle resolves the ops from the log
    fresh = TransactionalTable(spark, root)
    assert {r["k"]: r["price"] for r in fresh.read().collect()} == got
    # rename chains: price -> cost re-lives, old names stay retired
    t.rename_column("price", "cost")
    assert {r["k"]: r["cost"] for r in t.read().collect()} == got


def test_drop_column_zero_rewrite_and_dv_interplay(spark, tmp_path):
    """drop_column projects the column away metadata-only; DV deletes
    on the renamed/dropped table keep addressing rows correctly; a
    partition column cannot be renamed or dropped."""
    from pyspark.sql import functions as F

    from fefal_etl_spark.table import SchemaConflict, TransactionalTable

    import pytest

    root = str(tmp_path / "t")
    t = TransactionalTable(spark, root)
    t.overwrite(
        spark.range(20).select(
            (F.col("id") % 2).cast("string").alias("p"),
            F.col("id").alias("k"),
            (F.col("id") * 3).alias("junk"),
        ),
        partition_by=["p"],
    )
    files0 = t._read_manifest(0).files
    v1 = t.drop_column("junk")
    assert t._read_manifest(v1).files == files0
    assert "junk" not in t.read().columns
    # DV delete after the drop addresses the right rows
    t.delete_where_dv(F.col("k") == 4)
    assert sorted(r["k"] for r in t.read().collect()) == [
        i for i in range(20) if i != 4
    ]
    # retired: junk cannot come back
    with pytest.raises(SchemaConflict):
        t.append(
            spark.createDataFrame(
                [("1", 99, 0)], "p string, k bigint, junk bigint"
            ),
            partition_by=["p"],
        )
    # partition columns are path data — metadata ops must refuse
    with pytest.raises(SchemaConflict):
        t.rename_column("p", "bucket")
    with pytest.raises(SchemaConflict):
        t.drop_column("p")
    # model parity across a checkpoint: more commits than the interval
    t.CHECKPOINT_INTERVAL = 2
    for i in range(4):
        t.append(
            spark.createDataFrame([("0", 100 + i)], "p string, k bigint"),
            partition_by=["p"],
        )
    fresh = TransactionalTable(spark, root)
    assert (
        sorted(r["k"] for r in fresh.read().collect())
        == [i for i in range(20) if i != 4] + [100, 101, 102, 103]
    )
    assert "junk" not in fresh.read().columns


@_posix_log
def test_stream_source_applies_column_ops(spark, tmp_path):
    """A renamed/dropped table streams under its CURRENT logical schema:
    old-named files rename per batch, dropped columns vanish."""
    from pyspark.sql import functions as F

    from fefal_etl_spark.streaming.table_source import (
        TxnTableStreamDataSource,
    )
    from fefal_etl_spark.table import TransactionalTable

    spark.dataSource.register(TxnTableStreamDataSource)
    root = str(tmp_path / "t")
    t = TransactionalTable(spark, root)
    t.overwrite(
        spark.range(5).select(
            F.col("id").alias("k"),
            (F.col("id") * 2).alias("amount"),
            F.lit("x").alias("junk"),
        )
    )
    t.rename_column("amount", "price")
    t.drop_column("junk")
    t.append(spark.createDataFrame([(9, 90)], "k bigint, price bigint"))
    stream = (
        spark.readStream.format("txn_table_stream")
        .option("path", root)
        .load()
    )
    assert stream.columns == ["k", "price"]
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r["k"], r["price"]) for r in spark.read.parquet(out).collect()}
    assert got == {(i, i * 2) for i in range(5)} | {(9, 90)}


# ----------------------------------------------------------------------
# round-6 self-review fixes (code-review findings on the r6 diff)
# ----------------------------------------------------------------------


def test_restore_rebuilds_bloom_entries(spark, tmp_path):
    """Review fix: the delta log prunes bloom entries when files leave
    the table, so restore() must RE-RECORD the restored snapshot's
    blooms — point-lookup skipping survives an undo."""
    from pyspark.sql import functions as F

    from fefal_etl_spark.table import TransactionalTable

    root = str(tmp_path / "t")
    t = TransactionalTable(spark, root)
    t.overwrite(
        spark.range(200).select(F.col("id").alias("k")).repartitionByRange(8, "k")
    )
    t.build_bloom("k")
    kept0, total0 = t.skipped_files_bloom("k", 7)
    assert kept0 < total0  # bloom prunes
    t.overwrite(spark.createDataFrame([(999,)], "k bigint"))  # bad write
    v = t.restore(1)  # back to the bloomed snapshot
    kept, total = t.skipped_files_bloom("k", 7, version=v)
    assert (kept, total) == (kept0, total0)
    # and through a fresh handle (pure replay)
    fresh = TransactionalTable(spark, root)
    assert fresh.skipped_files_bloom("k", 7) == (kept0, total0)


def test_rebase_rejects_interleaved_column_retirement(spark, tmp_path):
    """Review fix: a commit rebasing over an interleaved drop_column /
    rename_column must NOT re-register the retired name (its data would
    silently vanish at read) — the in-CAS-loop check raises instead."""
    from pyspark.sql import functions as F

    from fefal_etl_spark.table import SchemaConflict, TransactionalTable

    root = str(tmp_path / "t")
    t = TransactionalTable(spark, root)
    t.overwrite(
        spark.createDataFrame([(1, 10)], "k int, x int")
    )
    # writer A prepares an append WITH column x against base 0
    a = TransactionalTable(spark, root)
    staged = a.stage_files(spark.createDataFrame([(2, 20)], "k int, x int"))
    # writer B retires x while A is in flight
    t.drop_column("x")
    # A's rebase (append semantics) must fail loudly, not land silently
    with pytest.raises(SchemaConflict):
        a._commit(
            staged,
            "append",
            0,
            rebase_ok=True,
            carry_parent_files=True,
            schema={"k": "int", "x": "int"},
        )
    # table unchanged: still 1 row, x dropped everywhere
    assert t.read().columns == ["k"]
    assert t.read().count() == 1


def test_vacuum_aborts_when_checkpoint_write_fails(spark, tmp_path):
    """Review fix: vacuum must abort BEFORE trimming the log when the
    safety checkpoint did not land (a swallowed ENOSPC would otherwise
    destroy every kept version's ancestry)."""
    from fefal_etl_spark.table import TransactionalTable

    root = str(tmp_path / "t")
    t = TransactionalTable(spark, root)
    for i in range(5):
        t.append(spark.createDataFrame([(i,)], "k int").coalesce(1))
    # simulate the checkpoint write failing silently
    t._write_checkpoint = lambda *a, **kw: None
    with pytest.raises(OSError, match="did not land"):
        t.vacuum(keep_versions=2)
    # log untrimmed: every version still resolvable
    assert t.versions() == [0, 1, 2, 3, 4]
    assert t.read(0).count() == 1 and t.read(4).count() == 5


@_posix_log
def test_mixed_layout_table_streams(spark, tmp_path):
    """Review fix: a table mixing unpartitioned commits (partition
    column in the parquet bytes) with hive-partitioned ones streams
    without duplicating the column."""
    from pyspark.sql import functions as F

    from fefal_etl_spark.streaming.table_source import (
        TxnTableStreamDataSource,
    )
    from fefal_etl_spark.table import TransactionalTable

    spark.dataSource.register(TxnTableStreamDataSource)
    root = str(tmp_path / "t")
    t = TransactionalTable(spark, root)
    # unpartitioned first: p physically stored as string
    t.overwrite(
        spark.createDataFrame([("a", 1), ("b", 2)], "p string, k bigint")
    )
    # then hive-partitioned: p only in the path
    t.append(
        spark.createDataFrame([("a", 3)], "p string, k bigint"),
        partition_by=["p"],
    )
    stream = (
        spark.readStream.format("txn_table_stream")
        .option("path", root)
        .load()
    )
    assert stream.columns.count("p") == 1
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r["p"], r["k"]) for r in spark.read.parquet(out).collect()}
    assert got == {("a", 1), ("b", 2), ("a", 3)}
