"""Round-5 operator tests: BFS layered min-agg mode, the transactional
table layer, postgres-dialect SQL builders, and the shared
similarity-staging cache."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


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
