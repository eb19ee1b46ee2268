"""Graph propagation operators expressed as DataFrame algebra.

Together with :func:`fefal_etl_spark.llm.dedup.connected_components` (label
propagation) and :func:`fefal_etl_spark.llm.similarity.kmeans_assignments`
(numeric refinement), :func:`pagerank` completes the engine's iterative-
algorithm templates: each round is a join + aggregation keyed on the node
id, the fixed-round loop unrolls into one lazy DAG, and nothing ever
touches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 2,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-round PageRank over a directed edge list.

    r₀ = 1/N; rₜ₊₁(n) = (1-d)/N + d·Σ_{m→n} rₜ(m)/outdeg(m). Nodes are
    everything appearing as src or dst; nodes without out-edges contribute
    nothing (standard dangling-mass simplification, documented — callers
    wanting mass conservation add the dangling term).

    Scale: the edge frame is persisted once (reused every round); each
    round is one src-keyed broadcast-scalar-free join + one dst-keyed sum
    — two hash shuffles per round on bounded-width rows. Fixed ``iters``
    keeps the DAG static; at many rounds insert checkpoints like the
    k-means template. Returns (node, rank) with the raw double rank —
    callers round for cross-engine comparison (float sums are
    order-dependent at the 1e-16 level, far below any sane rounding).
    """
    e = edges.select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst")).persist()
    nodes = (
        e.select(F.col("e_src").alias("node"))
        .unionByName(e.select(F.col("e_dst").alias("node")))
        .distinct()
        .persist()
    )
    n_total = nodes.agg(F.count(F.lit(1)).alias("__n"))
    outdeg = e.groupBy("e_src").agg(F.count(F.lit(1)).alias("__deg"))

    r = nodes.join(F.broadcast(n_total)).select(
        "node", (F.lit(1.0) / F.col("__n")).alias("rank")
    )
    for _ in range(iters):
        contrib = (
            e.join(r, F.col("e_src") == F.col("node"))
            .join(outdeg, "e_src")
            .select(
                F.col("e_dst").alias("node"),
                (F.col("rank") / F.col("__deg")).alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__contrib"))
        )
        r = (
            nodes.join(contrib, "node", "left")
            .join(F.broadcast(n_total))
            .select(
                "node",
                (
                    (1.0 - damping) / F.col("__n")
                    + damping * F.coalesce(F.col("__contrib"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return r
