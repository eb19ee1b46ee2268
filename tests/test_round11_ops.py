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
