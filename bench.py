"""Benchmark harness: runs the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the total wall time of all benchmark queries (each fully
materialized via a count-collecting action, never ``collect()`` of payload).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: one per operator family, the ones whose cost is data-bound
# (metadata-ish queries excluded to keep the signal clean).
BENCH_QUERIES = [
    # relational core
    "pricing_summary",
    "entity_resolution",
    "dedup_keep_best",
    "status_fork_counts",
    "unpivot_measures",
    "window_topk",
    "event_gaps",
    "sessionize",
    "events_hourly",
    "union_except",
    "rollup_lineitem",
    "revenue_by_nation",
    "asof_attribution",
    "range_join_windows",
    "sentence_explode",
    "top_orders",
    "shipping_priority",
    "top_volume_orders",
    # LLM-pipeline extensions
    "text_stats",
    "lang_id",
    "doc_fingerprints",
    "repetition_filter",
    "exact_dedup",
    "minhash_neardup",
    "simhash_fingerprints",
    "embedding_topk",
    "embedding_lsh_pairs",
    "ivf_topk",
    "multimodal_features",
    # pipeline assembly end-to-end
    "curation_pipeline",
    "pipeline_status_accounting",
    "pipeline_star_formations",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from fefal_etl_spark.queries import get_queries
    from fefal_etl_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries = get_queries()
    names = [n for n in BENCH_QUERIES if n in queries]

    # warm the JVM + parquet footers once (excluded from timing)
    queries["top_orders"](spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.time()
        df = queries[name](spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        assert n >= 0
    total = round(sum(timings.values()), 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "bench_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
