"""Round-5 operator tests: BFS layered min-agg mode, the transactional
table layer, postgres-dialect SQL builders, and the shared
similarity-staging cache."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def test_staging_fingerprint_tracks_source(tmp_path):
    """source_fingerprint must change when a source file's content stats
    change, and be order-independent across multiple tables."""
    import os
    import time

    from fefal_etl_spark.staging import source_fingerprint

    sf = tmp_path / "sf"
    sf.mkdir()
    (sf / "orders.parquet").write_bytes(b"aaaa")
    (sf / "customer.parquet").write_bytes(b"bbbb")
    fp1 = source_fingerprint(str(sf), "orders")
    assert fp1 == source_fingerprint(str(sf), "orders")
    assert source_fingerprint(str(sf), "orders", "customer") == (
        source_fingerprint(str(sf), "customer", "orders")
    )
    # size change -> new fingerprint
    (sf / "orders.parquet").write_bytes(b"aaaaaa")
    fp2 = source_fingerprint(str(sf), "orders")
    assert fp2 != fp1
    # mtime-only change (same size) -> new fingerprint
    os.utime(sf / "orders.parquet", ns=(time.time_ns(), time.time_ns() + 7))
    assert source_fingerprint(str(sf), "orders") != fp2
    # absent table is representable, not an error
    assert source_fingerprint(str(sf), "nope")


def test_stage_table_atomic_publish_and_reuse(spark, tmp_path, monkeypatch):
    """stage_table writes once, reuses on second call, never exposes a
    partial directory at the final path, and clears _SUCCESS-less debris."""
    import os

    from fefal_etl_spark.staging import stage_table, staging_root

    monkeypatch.setenv("FEFAL_STAGE_DIR", str(tmp_path / "stage"))
    calls = []

    def write(p):
        calls.append(p)
        spark.range(5).write.mode("overwrite").parquet(p)

    p1 = stage_table(spark, "t", "fp1", write)
    assert os.path.exists(os.path.join(p1, "_SUCCESS"))
    assert len(calls) == 1 and calls[0] != p1  # wrote to a tmp sibling
    p2 = stage_table(spark, "t", "fp1", write)
    assert p2 == p1 and len(calls) == 1  # reused, no rewrite
    # new fingerprint -> new directory
    p3 = stage_table(spark, "t", "fp2", write)
    assert p3 != p1 and len(calls) == 2
    # debris without _SUCCESS is cleared and rewritten
    os.remove(os.path.join(p1, "_SUCCESS"))
    p4 = stage_table(spark, "t", "fp1", write)
    assert os.path.exists(os.path.join(p4, "_SUCCESS")) and len(calls) == 3
    assert staging_root() == str(tmp_path / "stage")


def test_stage_table_lost_race_uses_winner(spark, tmp_path, monkeypatch):
    """If another session publishes the final dir between our write and
    rename, the rename loser must drop its attempt and read the winner."""
    import os

    from fefal_etl_spark.staging import stage_table

    monkeypatch.setenv("FEFAL_STAGE_DIR", str(tmp_path / "stage"))

    def write_and_interleave(p):
        spark.range(3).write.mode("overwrite").parquet(p)
        # simulate the concurrent winner publishing first
        winner = os.path.join(str(tmp_path / "stage"), "race-fp")
        spark.range(7).write.mode("overwrite").parquet(winner)

    path = stage_table(spark, "race", "fp", write_and_interleave)
    assert spark.read.parquet(path).count() == 7  # winner's data survived
    leftovers = [
        d
        for d in os.listdir(str(tmp_path / "stage"))
        if ".tmp-" in d and d.startswith("race-")
    ]
    assert leftovers == []  # loser cleaned up


def test_bfs_min_agg_mode_matches_pruned_mode(spark):
    """prune_visited=False (layered min-aggregation, single DAG) must
    return exactly the same (node, level) map as the pruned
    anti-join form on a graph with cycles, reconvergent paths, and
    unreachable nodes."""
    from fefal_etl_spark.operators.graph import bfs_levels

    edges = spark.createDataFrame(
        [
            ("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"),  # reconverge at d
            ("d", "a"),                                      # cycle back
            ("d", "e"), ("e", "f"),
            ("x", "y"),                                      # unreachable island
        ],
        "src string, dst string",
    )
    for hops in (1, 2, 3, 6):
        pruned = {
            r["node"]: r["level"]
            for r in bfs_levels(
                edges, "a", max_hops=hops, early_exit=False
            ).collect()
        }
        layered = {
            r["node"]: r["level"]
            for r in bfs_levels(
                edges, "a", max_hops=hops, prune_visited=False
            ).collect()
        }
        assert layered == pruned, f"hops={hops}"
