#!/usr/bin/env python
"""Phase-timing probe for catalog queries (optimization rounds).

For each named query: stage the bench warehouse layout once, warm the
query, then measure N rounds of (build_sec = query-function call, which
executes any eager checkpoints / driver fast paths; exec_sec = noop
write of the returned frame), plus the Spark job count in each phase
via the status tracker. Prints one JSON line per query.

Usage: python tools/probe_query.py name1 name2 ... [--rounds 3] [--raw]
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
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--raw", action="store_true", help="skip bench staging")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    from bi_gcp_stitch_repl_spark.queries import catalog
    from bi_gcp_stitch_repl_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="probe", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    queries = catalog.queries()

    bench_dir = args.sf_dir
    if not args.raw:
        import bench as B

        bench_dir, _ = B.stage_tables(spark, args.sf_dir)

    st = spark.sparkContext.statusTracker()

    def njobs() -> int:
        return len(st.getJobIdsForGroup(None) or [])

    for name in args.names:
        fn = queries[name]
        # warm-up
        fn(spark, bench_dir).write.format("noop").mode("overwrite").save()
        rows = []
        for _ in range(args.rounds):
            j0 = njobs()
            t0 = time.time()
            df = fn(spark, bench_dir)
            t1 = time.time()
            j1 = njobs()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            j2 = njobs()
            rows.append(
                {
                    "build_sec": round(t1 - t0, 3),
                    "exec_sec": round(t2 - t1, 3),
                    "build_jobs": j1 - j0,
                    "exec_jobs": j2 - j1,
                }
            )
        best = min(rows, key=lambda r: r["build_sec"] + r["exec_sec"])
        print(json.dumps({"name": name, "best": best, "rounds": rows}))


if __name__ == "__main__":
    main()
