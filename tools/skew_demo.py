"""Measured skew demonstration (SCALING.md "skew" section): salted
two-level top-k vs the naive single window on a deliberately hot key.

Builds a skewed frame from sf0.1 lineitem inflated to ~60M rows where 99%
of rows share ONE group key, then times:

- naive: ``ROW_NUMBER() OVER (PARTITION BY grp ORDER BY ...) <= k`` — the
  hot key's entire row set lands in ONE reducer task (windows are not
  AQE-skew-splittable);
- salted: top-k per (grp, 64-way salt of the unique tiebreaker) first,
  then the exact window over the <= 64*k survivors — the same two-level
  plan ``w_topk_per_group`` ships.

Both produce identical results (asserted). Two metrics are reported:

- wall-clock, and
- MAX TASK TIME (from the UI REST API) — the cluster-predictive number:
  on a real cluster, job latency is the slowest task, and the naive
  plan's hot task grows with the hot key share × corpus while every
  other core idles. The salted plan divides that task by the lane count.

Honest local caveats (measured, recorded in SCALING.md): on a SINGLE
node with a small shared memory pool (e.g. local[8] / 2 GiB) the naive
plan can WIN wall-clock — its lone straggler enjoys the entire executor
memory pool while the salted plan's 8 concurrent sorters divide it and
all spill. That inversion is an artifact of shared-pool local mode; with
per-slot memory (24 GiB here, or any real cluster where each task gets a
fixed slot) the salted plan wins both metrics (measured 2.2x at 60M
rows) and the naive max-task time is the number that scales with data,
not with the cluster.

Usage:
    python tools/skew_demo.py [--sf-dir /root/testdata/sf0.1] [--inflate 100]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--k", type=int, default=3)
    ap.add_argument("--inflate", type=int, default=100)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("skew-demo")
        # 2x the salt-lane count so hot lanes spread 1:1 over reducers
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")

    li = spark.read.parquet(f"{args.sf_dir}/lineitem.parquet")
    li = li.withColumn(
        "_copy", F.explode(F.array(*[F.lit(i) for i in range(args.inflate)]))
    )
    uid = F.xxhash64("l_orderkey", "l_linenumber", "_copy")
    skewed = li.select(
        F.when(F.pmod(uid, F.lit(100)) < 99, F.lit("hot"))
        .otherwise(F.concat(F.lit("cold"), F.pmod(uid, F.lit(100))))
        .alias("grp"),
        uid.alias("row_id"),
        F.col("l_extendedprice").alias("metric"),
    ).repartition(32).localCheckpoint(eager=True)  # isolate plan from scan
    n = skewed.count()
    k = args.k

    w = Window.partitionBy("grp").orderBy(F.col("metric").desc(), F.col("row_id"))
    w_local = Window.partitionBy("grp", "_salt").orderBy(
        F.col("metric").desc(), F.col("row_id")
    )

    naive = skewed.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)
    survivors = (
        skewed.withColumn("_salt", F.pmod(F.xxhash64("row_id"), F.lit(64)))
        .withColumn("_lrk", F.row_number().over(w_local))
        .filter(F.col("_lrk") <= k)
        .drop("_salt", "_lrk")
    )
    salted = survivors.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= k
    )

    def run(name, df):
        tracker = sc.statusTracker()
        sc.setJobGroup(name, name)
        t0 = time.monotonic()
        rows = df.collect()
        wall = time.monotonic() - t0
        stage_ids = set()
        for j in tracker.getJobIdsForGroup(name) or []:
            ji = tracker.getJobInfo(j)
            if ji:
                stage_ids |= set(ji.stageIds)
        worst = 0
        base, app = sc.uiWebUrl, sc.applicationId
        for sid in stage_ids:
            try:
                url = f"{base}/api/v1/applications/{app}/stages/{sid}?details=true"
                with urllib.request.urlopen(url) as r:
                    for attempt in json.load(r):
                        for t in (attempt.get("tasks") or {}).values():
                            worst = max(worst, t.get("duration", 0))
            except Exception:
                pass
        return rows, wall, worst / 1000.0

    rows_n, wall_n, task_n = run("naive", naive)
    rows_s, wall_s, task_s = run("salted", salted)
    assert sorted(map(tuple, rows_n)) == sorted(map(tuple, rows_s))
    print(f"rows={n}  hot-key share=99%  k={k}  cpus={args.cpus}")
    print(f"naive_window      wall {wall_n:6.2f}s  max_task {task_n:6.2f}s")
    print(f"salted_two_level  wall {wall_s:6.2f}s  max_task {task_s:6.2f}s")
    # max-task metrics come from the UI REST API; if that was
    # unavailable (ui disabled, port bind failure) they are 0.0 — keep
    # the wall-clock result instead of dying on the ratio
    ratio = f"{task_n / task_s:.1f}x" if task_s > 0 else "n/a (no UI metrics)"
    print(
        f"speedup: wall {wall_n / wall_s:.1f}x, max-task {ratio}"
        " (max-task is what a cluster pays)"
    )


if __name__ == "__main__":
    main()
