"""Time every catalog query end-to-end at a given SF (PERF.md generator).

Usage:
    python tools/perf_catalog.py [--sf-dir /root/testdata/sf0.1] \
        [--only name1,name2] [--repeat 1] [--json out.json]

One warm local[N] session, sequential execution, wall time per
``collect()``. Prints a markdown table sorted slowest-first plus a
total; with ``--json`` also dumps {name: {"sec": s, "rows": n}}.
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
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--only", default="")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--json", default="")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("perf-catalog")
        .config("spark.sql.shuffle.partitions", args.cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from bi_gcp_stitch_repl_spark.queries import catalog

    qs = catalog.queries()
    names = [n for n in args.only.split(",") if n] or list(qs)
    # JVM warm-up: one cheap scan so the first timed query isn't billed
    # for codegen/compiler startup
    spark.read.parquet(f"{args.sf_dir}/region.parquet").count()
    # pyspark.ml warm-up: class loading + breeze init costs ~1.5-2 s on
    # first use; that's session init, not the first ML query's cost
    try:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        tiny = spark.createDataFrame(
            [([0.0, 1.0],), ([1.0, 0.0],), ([0.5, 0.5],)], ["v"]
        ).withColumn("_fv", array_to_vector("v"))
        KMeans(k=2, seed=1, featuresCol="_fv", maxIter=1).fit(tiny)
    except Exception:
        pass

    results: dict[str, dict] = {}
    for name in names:
        best, rows = None, 0
        for _ in range(args.repeat):
            t0 = time.monotonic()
            rows = len(qs[name](spark, args.sf_dir).collect())
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        results[name] = {"sec": round(best, 2), "rows": rows}
        print(f"{name:40s} {best:6.2f}s  {rows} rows", flush=True)

    total = sum(r["sec"] for r in results.values())
    print(f"\nTOTAL {total:.1f} s for {len(results)} queries")
    print("\n| query | sec | rows |\n|---|---|---|")
    for name, r in sorted(results.items(), key=lambda kv: -kv[1]["sec"]):
        print(f"| {name} | {r['sec']:.2f} | {r['rows']} |")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
