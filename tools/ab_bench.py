"""Targeted A/B timing harness for the drift-control protocol
(BASELINE.md / VERDICT r4-r5): time a handful of registry queries
(cold + warm, same session) in THIS tree, print one JSON line.

Run it twice — once in a worktree pinned at the control commit, once at
HEAD, back to back on an idle machine — and compare warm times. Usage:

    python tools/ab_bench.py copurchase_lift bloom_prune_join \
        [--sf /root/testdata/sf0.1] [--reps 3]

``--reps`` repeats the warm pass and reports the MINIMUM (the
scheduling-noise floor at small SF is ~0.1-0.2 s per job; min-of-3 is
the stable comparator the drift protocol uses).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from fefal_etl_spark.queries import get_queries
    from fefal_etl_spark.session import get_spark

    spark = get_spark("ab_bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = get_queries()
    queries["top_orders"](spark, args.sf).count()  # JVM/footer warmup

    from fefal_etl_spark.cache import release_tracked

    out = {}
    for name in args.names:
        fn = queries[name]
        t0 = time.perf_counter()
        fn(spark, args.sf).count()
        cold = time.perf_counter() - t0
        release_tracked()
        warms = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fn(spark, args.sf).count()
            warms.append(time.perf_counter() - t0)
            release_tracked()
        out[name] = {
            "cold": round(cold, 3),
            "warm_min": round(min(warms), 3),
            "warm_all": [round(w, 3) for w in warms],
        }
    print(json.dumps({"sf": args.sf, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
