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

    per_query: dict[str, dict] = {}
    for name in names:
        queries[name](spark, sf_dir).count()  # cold (codegen + caches)
        t0 = time.time()
        queries[name](spark, sf_dir).count()
        s_sec = time.time() - t0
        release_tracked()

        sql = oracles[name]
        con.execute(sql).fetchall()  # cold (compile)
        t0 = time.time()
        con.execute(sql).fetchall()
        d_sec = time.time() - t0

        per_query[name] = {
            "spark_sec": round(s_sec, 3),
            "duck_sec": round(d_sec, 3),
            "ratio": round(s_sec / d_sec, 2) if d_sec > 0 else None,
        }

    ratios = sorted(v["ratio"] for v in per_query.values() if v["ratio"])
    total_s = sum(v["spark_sec"] for v in per_query.values())
    total_d = sum(v["duck_sec"] for v in per_query.values())
    out = {
        "metric": "spark_vs_duckdb_warm",
        "sf_dir": sf_dir,
        "n": len(per_query),
        "spark_total_sec": round(total_s, 2),
        "duck_total_sec": round(total_d, 2),
        "aggregate_ratio": round(total_s / total_d, 2),
        "median_ratio": ratios[len(ratios) // 2] if ratios else None,
        "p90_ratio": ratios[int(len(ratios) * 0.9)] if ratios else None,
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
