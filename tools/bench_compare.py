"""Spark vs DuckDB wall-time comparison on the oracle queries.

    python tools/bench_compare.py [--sf /root/testdata/sf0.1] [names...]

Prints a markdown table (for BASELINE.md). Spark times are end-to-end
(count() action, plan + execute); DuckDB runs the oracle SQL single-process.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import duckdb

    from fefal_etl_spark.queries import get_oracles, get_queries
    from fefal_etl_spark.session import get_spark

    spark = get_spark("bench_compare")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    queries = get_queries()
    oracles = get_oracles()
    names = args.names or [n for n in queries if n in oracles]

    # warm JVM
    queries["top_orders"](spark, args.sf).count()

    rows = []
    for name in names:
        t0 = time.time()
        queries[name](spark, args.sf).count()
        ts = time.time() - t0
        t0 = time.time()
        con.execute(f"SELECT count(*) FROM ({oracles[name]}) t").fetchone()
        td = time.time() - t0
        rows.append((name, ts, td, ts / td if td > 0 else float("inf")))
        print(f"| {name} | {ts:.2f} | {td:.2f} | {ts/td:.1f}× |", flush=True)
    tot_s = sum(r[1] for r in rows)
    tot_d = sum(r[2] for r in rows)
    print(f"| **total** | **{tot_s:.2f}** | **{tot_d:.2f}** | **{tot_s/tot_d:.1f}×** |")
    spark.stop()


if __name__ == "__main__":
    main()
