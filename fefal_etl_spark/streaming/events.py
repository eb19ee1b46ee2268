"""Structured Streaming layer (SURVEY.md §2.11, [EXT]).

The reference is an annual batch job; the engine exposes its transform
vocabulary over unbounded event streams. Design rule: **every streaming
transform is a plain function DataFrame → DataFrame that also works on a
batch frame** — the same code path is verified batch-side by the driver's
oracle (``events_hourly``, ``sessionize``, ``first_event_per_type``) and
runs incrementally under ``readStream``.

Scale notes: event-time windows + watermarks bound state; dropDuplicates
state is keyed (event key) and expired by the watermark; sinks should be
partitioned by window start date for pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession, path: str, fmt: str = "parquet"
) -> DataFrame:
    """File-source stream over an events directory (one file per micro-batch
    in tests via ``maxFilesPerTrigger``)."""
    return (
        spark.readStream.format(fmt)
        .schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .load(path)
    )


def enrich_with_dim(
    events: DataFrame, dim: DataFrame, on: str, how: str = "left"
) -> DataFrame:
    """Stream-static enrichment: join the event stream against a static
    dimension (the lookup-table decoration every event pipeline runs before
    aggregating). Structured Streaming supports this join natively — the
    static side is planned per micro-batch, and ``F.broadcast`` pins the
    hash-join strategy so the STREAM side is never shuffled by the join
    (state-free, unlike stream-stream joins: no watermark is required and
    no join state accumulates).

    At scale the dim refreshes by re-reading a path each micro-batch
    (file-source static frames re-list on access) or via a foreachBatch
    that re-resolves the dim; either way the stream side's plan is a
    map-side broadcast hash join at event-arrival speed.
    """
    return events.join(F.broadcast(dim), on=on, how=how)


def hourly_counts(
    events: DataFrame, watermark: str = "2 hours", window: str = "1 hour"
) -> DataFrame:
    """Tumbling event-time aggregation with late-data watermark — the
    streaming twin of the ``events_hourly`` oracle query."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


def sliding_counts(
    events: DataFrame,
    watermark: str = "2 hours",
    window: str = "1 hour",
    slide: str = "15 minutes",
) -> DataFrame:
    """Sliding-window per-type rates (each event lands in window/slide
    overlapping windows — an Expand, not a shuffle multiplier)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
        )
    )


def session_aggregate(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Per-user session windows (gap-based) — streaming-native
    ``session_window``; the batch twin is the ``sessionize`` oracle query
    (lag + running sum formulation)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def dedup_stream(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Exactly-once event dedup within the watermark horizon
    (``dropDuplicates`` keyed state; the batch twin is
    ``first_event_per_type``)."""
    keys = keys or ["event_id"]
    return events.withWatermark("ts", watermark).dropDuplicates(keys)


def stream_append_parquet(
    stream_df: DataFrame, path: str, checkpoint: str
) -> "object":
    """Production file sink: append micro-batches to a parquet directory
    with exactly-once delivery via the checkpoint + file-sink commit log —
    restarting after a crash resumes from the last committed batch without
    duplicating rows. Drains currently-available input (availableNow);
    swap the trigger for a processing-time interval in continuous runs.

    Small files accumulate one-per-batch-per-partition; schedule
    `sources.writers.compact_parquet` on the output.
    """
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def run_foreach_batch(
    stream_df: DataFrame, batch_fn, checkpoint: str
) -> "object":
    """Custom-sink hook: ``batch_fn(batch_df, batch_id)`` runs once per
    micro-batch with a BATCH DataFrame — the bridge for sinks Structured
    Streaming lacks natively (JDBC upserts, dim merges, star-schema loads).
    Exactly-once only if ``batch_fn`` is idempotent per ``batch_id`` (the
    checkpoint replays the last uncommitted batch after a crash)."""
    q = (
        stream_df.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def jdbc_upsert_sink(url: str, table: str, key_cols: list[str], **properties):
    """``foreachBatch`` sink: key-idempotent upsert into a JDBC table — the
    reference's actual load topology (staging → dim/fact upserts into the
    DW over JDBC, etl_ui.py:394-664) driven by a stream instead of a
    button click.

    Per micro-batch: dedupe the batch on ``key_cols``, anti-join against
    the keys already in the table (only the key columns are read back —
    column pruning pushes into the JDBC scan), bulk-append the remainder
    (``sources.writers.write_jdbc``; Spark creates the table on the first
    batch). Insert-only-new-keys makes the sink IDEMPOTENT per key, which
    is what upgrades the checkpoint's at-least-once replay (a crash after
    commit-to-DB but before checkpoint-commit replays the batch) into
    exactly-once landed rows. Keys must be non-null; null-key dims go
    through ``operators.upsert`` (null-safe) in a batch reload instead.

    Single-writer assumption: anti-join + append is not transactional, so
    one stream owns a target table (the reference's loader holds the same
    assumption, one wizard run at a time).
    """

    def batch_fn(batch_df: DataFrame, batch_id: int) -> None:
        from fefal_etl_spark.sources.readers import read_jdbc
        from fefal_etl_spark.sources.writers import write_jdbc

        incoming = batch_df.dropDuplicates(key_cols)
        try:
            existing = read_jdbc(
                batch_df.sparkSession, url, table, **properties
            ).select(*key_cols)
            incoming = incoming.join(existing, on=key_cols, how="left_anti")
        except Exception as e:
            # ONLY table-absent is a legitimate skip (first batch, table
            # created by the append below). Any other read failure — DB
            # restart, timeout, auth — must fail the batch: swallowing it
            # would drop the anti-join and bulk-append duplicates, silently
            # voiding the exactly-once guarantee. Matches Derby
            # ("Table/View 'X' does not exist"), PostgreSQL ("relation ...
            # does not exist"), MySQL ("... doesn't exist").
            msg = str(e).lower()
            if "exist" not in msg:
                raise
        write_jdbc(incoming, url, table, mode="append", **properties)

    return batch_fn


def transactional_table_sink(
    root: str,
    app_id: str = "stream",
    auto_compact_every: int | None = None,
    small_file_mb: float = 32.0,
):
    """``foreachBatch`` sink committing each micro-batch as an ATOMIC
    snapshot of a :class:`fefal_etl_spark.table.TransactionalTable` —
    the lakehouse upgrade of :func:`stream_append_parquet`: readers see
    whole batches or nothing (manifest swap), every batch commit is
    time-travelable, and exactly-once comes from the manifest's
    (app_id, batch_id) idempotence ledger rather than the file-sink's
    proprietary commit log. A crash between table-commit and
    checkpoint-commit replays the batch; ``append_txn`` sees the ledger
    already covers it and skips — at-least-once replay, exactly-once
    landed rows (the Delta txnAppId/txnVersion protocol). Unlike
    :func:`jdbc_upsert_sink`, multiple concurrent writers are safe: the
    commit CAS rebases appends and re-checks the ledger on every retry.

    ``auto_compact_every=N`` (round 8) makes the ingest SELF-MAINTAINING:
    after every Nth landed batch the sink runs an INCREMENTAL OPTIMIZE
    (`table.py::compact(small_file_mb=...)`) — bin-packing only the
    small per-batch files accumulated since the last pass, O(ingest)
    not O(table), and rebasing over any append that lands concurrently
    (the round-8 maintenance narrowing). A lost race with a REAL
    conflicting writer (a rewrite) just skips this pass — the next
    trigger retries; compaction is a logical no-op so skipping is
    always safe. This closes the classic streaming-lakehouse loop:
    micro-batches create small files, maintenance erases them, and
    neither blocks the other."""

    # cadence counts LANDED batches, not table versions (review
    # finding: compaction's own commits inflate the version, so a
    # version-modulo trigger fired every batch once the parities
    # aligned — and a concurrent writer made it arbitrary); ledger-
    # skipped replays don't count
    landed_batches = [0]

    def batch_fn(batch_df: DataFrame, batch_id: int) -> None:
        from fefal_etl_spark.table import CommitConflict, TransactionalTable

        t = TransactionalTable(batch_df.sparkSession, root)
        landed = t.append_txn(batch_df, app_id, batch_id)
        if landed is None or not auto_compact_every:
            return
        landed_batches[0] += 1
        if landed_batches[0] % auto_compact_every == 0:
            try:
                t.compact(small_file_mb=small_file_mb)
            except CommitConflict:
                pass  # a rewrite won the race; next pass retries

    return batch_fn


def transactional_table_mv_sink(
    root: str,
    view_root: str,
    group_keys: list[str],
    sum_cols: list[str],
    app_id: str = "stream",
):
    """:func:`transactional_table_sink` plus a continuously-maintained
    aggregate: after each micro-batch lands (exactly-once via the txn
    ledger), the `materialized.IncrementalAggView` at ``view_root`` is
    refreshed from the commit-log delta — which for a streaming append
    is exactly the micro-batch's files, so the view refresh costs
    O(micro-batch + view), never a base rescan.

    Crash semantics compose: a replay between table-commit and
    checkpoint-commit is skipped by the TABLE ledger (no double-append),
    and a crash between table-commit and view-refresh is healed on the
    next batch — the view ledger records the last APPLIED source
    version, so the catch-up delta spans both batches. The view is
    therefore eventually exactly-once without two-phase coordination
    between sink and view (the downstream read is always a consistent
    snapshot of SOME prefix of the stream)."""

    base_fn = transactional_table_sink(root, app_id)

    def batch_fn(batch_df: DataFrame, batch_id: int) -> None:
        from fefal_etl_spark.materialized import IncrementalAggView
        from fefal_etl_spark.table import CommitConflict, TransactionalTable

        base_fn(batch_df, batch_id)
        mv = IncrementalAggView(
            batch_df.sparkSession,
            TransactionalTable(batch_df.sparkSession, root),
            view_root,
            group_keys,
            sum_cols,
        )
        try:
            mv.refresh()
        except CommitConflict:
            # a concurrent refresher won this interval; its commit (or
            # the next batch's catch-up delta) covers our source version
            pass

    return batch_fn


def run_to_memory_sink(
    stream_df: DataFrame, query_name: str, output_mode: str = "append"
) -> "object":
    """Drive a streaming DataFrame to completion over the currently available
    files (availableNow trigger) into an in-memory table — the test/debug
    harness; production sinks are parquet/Kafka via the same writeStream."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def purchase_view_attribution(
    views: DataFrame,
    purchases: DataFrame,
    max_lag: str = "30 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: each purchase is joined to the same
    user's *view* events in the preceding ``max_lag`` window (click-to-buy
    attribution). Batch/stream-shared like every transform here: on batch
    frames it is a plain range-predicate join; under ``readStream`` the
    watermarks plus the time-bound join condition let Spark expire both
    join-state sides — an unbounded stream-stream join would otherwise
    keep every row forever (state-bound is the whole design constraint of
    streaming joins; SURVEY §2.11).

    Output: one row per (purchase, matching view) with the view-to-purchase
    lag in seconds.

    Scale: state per key is bounded by watermark × event rate; the join
    hashes both streams on user_id. Late views beyond the watermark are
    dropped identically batch-vs-stream only when the batch side applies
    the same bound — callers compare on drained (AvailableNow) runs.

    ``how="left_outer"`` keeps unmatched purchases with NULL view columns —
    in streaming mode the null-padded row is emitted only once the
    watermark proves no matching view can still arrive (the state-eviction
    contract outer stream-stream joins hang on); on batch frames it is a
    plain outer join, so drained runs still compare equal.
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(f"how must be inner|left_outer, got {how!r}")
    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("event_id").alias("view_id"),
    ).withWatermark("v_ts", watermark)
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value"),
    ).withWatermark("p_ts", watermark)
    cond = (
        (F.col("v_user") == F.col("p_user"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {max_lag}"))
    )
    return p.join(v, cond, how).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "view_id",
        F.col("value"),
        (F.unix_timestamp("p_ts") - F.unix_timestamp("v_ts")).alias("lag_s"),
    )


def dedup_stream_within_watermark(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Time-bounded streaming dedup via ``dropDuplicatesWithinWatermark``
    (Spark 3.5+): duplicates are only suppressed while their key is inside
    the watermark horizon, after which state is GUARANTEED dropped — unlike
    plain ``dropDuplicates`` whose state for never-expiring keys grows
    forever when keys don't embed event time. This is the right dedup for
    at-least-once sources (Kafka redelivery) where duplicates arrive close
    together: state is bounded by watermark × key rate BY CONSTRUCTION.

    Falls back to :func:`dedup_stream` semantics on batch frames (the API
    is streaming-only, so the batch path uses plain dropDuplicates — same
    result when all duplicates are within the horizon, which the tests
    assert)."""
    keys = keys or ["event_id"]
    if not events.isStreaming:
        return events.dropDuplicates(keys)
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)
