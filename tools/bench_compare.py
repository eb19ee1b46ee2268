"""Per-query Spark-vs-DuckDB ratio artifact (VERDICT r3 item 8).

For every bench-headline query with a declared oracle, runs the Spark
implementation and its DuckDB SQL twin side-by-side at the bench SF and
records warm wall times + the ratio, so the "data-bound twins near parity /
aggregate gap is fixed-overhead-bound" claim is verifiable without
re-running anything:

    python tools/bench_compare.py            # sf0.1 → bench_compare.json

Method: each engine gets one cold pass (discarded: Spark pays codegen +
shared-cache build, DuckDB pays its own compile) and one timed warm pass.
Spark materializes via count(); DuckDB via fetchall() (its execution is
eager into the result set — the closest equivalent materialization).
Ratios > 1 mean Spark is slower. Local single-node context: DuckDB is an
in-process vectorized engine with zero scheduling overhead, while Spark
pays per-stage scheduling that amortizes only at cluster scale — the
per-query ratio distribution (median vs tail) separates fixed overhead
from genuine plan gaps (BASELINE.md discussion).

Overhead isolation (VERDICT r4 item 6): the warm Spark pass runs inside
a job group so the artifact records ``spark_jobs`` — the number of Spark
JOBS the query schedules (AQE sub-jobs included; every job pays the
fixed driver/scheduler round-trip DuckDB doesn't have). The harness
measures that fixed per-job cost empirically (median warm wall of a
1-row no-shuffle job, ``per_job_cost_sec``) and publishes
``overhead_adjusted_ratio`` = max(spark − jobs·per_job_cost, 1 ms) /
duck per query, plus adjusted aggregates — so the "tail ratios are
scheduling-bound, not plan defects" claim is auditable per query
instead of asserted.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import duckdb

    from bench import BENCH_QUERIES
    from fefal_etl_spark.cache import release_tracked
    from fefal_etl_spark.queries import get_oracles, get_queries
    from fefal_etl_spark.session import get_spark

    spark = get_spark("bench_compare")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries, oracles = get_queries(), get_oracles()
    names = [n for n in BENCH_QUERIES if n in queries and n in oracles]
    spark_warmup = queries["top_orders"](spark, sf_dir).count()
    assert spark_warmup >= 0

    # empirical fixed cost of ONE Spark job on this machine: median warm
    # wall of a 1-row no-shuffle action (pure schedule/dispatch/collect)
    sc = spark.sparkContext
    job_costs = []
    for _ in range(15):
        t0 = time.time()
        spark.range(1).count()
        job_costs.append(time.time() - t0)
    per_job_cost = sorted(job_costs)[len(job_costs) // 2]

    tracker = sc.statusTracker()
    per_query: dict[str, dict] = {}
    for name in names:
        queries[name](spark, sf_dir).count()  # cold (codegen + caches)
        group = f"bc-{name}"
        sc.setJobGroup(group, name)
        try:
            t0 = time.time()
            queries[name](spark, sf_dir).count()
            s_sec = time.time() - t0
            jobs = len(tracker.getJobIdsForGroup(group))
        finally:
            sc.setJobGroup("", "")
        release_tracked()

        sql = oracles[name]
        con.execute(sql).fetchall()  # cold (compile)
        t0 = time.time()
        con.execute(sql).fetchall()
        d_sec = time.time() - t0

        adj = max(s_sec - jobs * per_job_cost, 0.001)
        per_query[name] = {
            "spark_sec": round(s_sec, 3),
            "spark_jobs": jobs,
            "duck_sec": round(d_sec, 3),
            "ratio": round(s_sec / d_sec, 2) if d_sec > 0 else None,
            "overhead_adjusted_ratio": (
                round(adj / d_sec, 2) if d_sec > 0 else None
            ),
        }

    def dist(key: str):
        vals = sorted(v[key] for v in per_query.values() if v[key])
        if not vals:
            return None, None
        return vals[len(vals) // 2], vals[int(len(vals) * 0.9)]

    ratios_med, ratios_p90 = dist("ratio")
    adj_med, adj_p90 = dist("overhead_adjusted_ratio")
    total_s = sum(v["spark_sec"] for v in per_query.values())
    total_d = sum(v["duck_sec"] for v in per_query.values())
    total_adj = sum(
        max(v["spark_sec"] - v["spark_jobs"] * per_job_cost, 0.001)
        for v in per_query.values()
    )
    out = {
        "metric": "spark_vs_duckdb_warm",
        "sf_dir": sf_dir,
        "n": len(per_query),
        "per_job_cost_sec": round(per_job_cost, 4),
        "spark_total_sec": round(total_s, 2),
        "duck_total_sec": round(total_d, 2),
        "aggregate_ratio": round(total_s / total_d, 2),
        "overhead_adjusted_aggregate_ratio": round(total_adj / total_d, 2),
        "median_ratio": ratios_med,
        "p90_ratio": ratios_p90,
        "overhead_adjusted_median_ratio": adj_med,
        "overhead_adjusted_p90_ratio": adj_p90,
        "queries": per_query,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_compare.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "queries"}))
    spark.stop()


if __name__ == "__main__":
    main()
