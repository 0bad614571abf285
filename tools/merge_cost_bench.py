"""Merge-cost-tracks-batch benchmark (SCALING.md §3 / PERF.md).

Claim under test: VersionedTable's file-pruned MERGE rewrites only files
whose logged key [min,max] overlaps the batch — O(affected data), not
O(table). Setup: sf0.1 orders (150k rows) as a VersionedTable, compacted
and Z-ordered on the merge key into 64 files, then three merges:

1. clustered 1% batch (contiguous o_orderkey range) — should rewrite ~1-2
   of 64 files;
2. uniform-random 1% batch — overlaps every file's range, so pruning
   cannot help (the honest contrast: pruning is a property of layout,
   which is why `optimize(zorder_by=...)` exists);
3. the same clustered batch into a plain ParquetTable — the full-rewrite
   K1 baseline.

Prints rewritten/total file counts and wall times.

Usage: python tools/merge_cost_bench.py [--sf-dir ...] [--files 64]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--files", type=int, default=64)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from bi_gcp_stitch_repl_spark.sinks.merge import ParquetTable
    from bi_gcp_stitch_repl_spark.sinks.versioned import VersionedTable

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("merge-cost-bench")
        .config("spark.sql.shuffle.partitions", args.cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    orders = spark.read.parquet(f"{args.sf_dir}/orders.parquet")
    n = orders.count()
    lo, hi = orders.agg(F.min("o_orderkey"), F.max("o_orderkey")).collect()[0]
    span = hi - lo + 1
    work = tempfile.mkdtemp(prefix="merge_cost_")
    try:
        t = VersionedTable(spark, os.path.join(work, "v"))
        t.append(orders)
        t.optimize(target_files=args.files, zorder_by=["o_orderkey"])
        total_files = len(t.files_at())

        def batch_of(pred):
            return (
                orders.filter(pred)
                .withColumn("o_orderpriority", F.lit("0-UPDATED"))
            )

        # 1% contiguous key range (clustered batch)
        clustered = batch_of(F.col("o_orderkey") < lo + span / 100).localCheckpoint()
        nb = clustered.count()
        t0 = time.monotonic()
        v = t.merge_upsert(clustered, keys=["o_orderkey"])
        dt_clustered = time.monotonic() - t0
        h = {e["version"]: e for e in t.history()}[v]
        print(
            f"clustered 1% batch ({nb} rows): rewrote {h['n_remove']} of "
            f"{total_files} files (+{h['n_add']} new) in {dt_clustered:.2f}s"
        )

        # uniform-random 1% batch (overlaps every file)
        rand = batch_of(F.pmod(F.xxhash64("o_orderkey"), F.lit(100)) == 0).localCheckpoint()
        nr = rand.count()
        t0 = time.monotonic()
        v = t.merge_upsert(rand, keys=["o_orderkey"])
        dt_rand = time.monotonic() - t0
        h = {e["version"]: e for e in t.history()}[v]
        print(
            f"random 1% batch ({nr} rows): rewrote {h['n_remove']} of "
            f"{len(t.files_at(v - 1))} files (+{h['n_add']}) in {dt_rand:.2f}s"
            " — uniform keys overlap every file; pruning is a layout property"
        )

        # plain ParquetTable full-rewrite baseline
        p = ParquetTable(spark, os.path.join(work, "p"))
        p.overwrite(orders)
        t0 = time.monotonic()
        p.merge_upsert(clustered, keys=["o_orderkey"])
        dt_full = time.monotonic() - t0
        print(f"ParquetTable full-rewrite baseline (same batch): {dt_full:.2f}s")
        print(
            f"summary rows={n} files={total_files} "
            f"clustered={dt_clustered:.2f}s random={dt_rand:.2f}s "
            f"full_rewrite={dt_full:.2f}s"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
