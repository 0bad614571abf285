#!/usr/bin/env python
"""Opt-in CORE-scaling ground truth at a synthesized larger SF (r11
verdict #7): at sf0.1 every bench query is overhead/driver-bound — the
8-vs-32-core ratios all sit at ≈1 — so "parallelizes" claims had no
driver-visible measurement. This probe synthesizes an sfN-equivalent
dataset from the deterministic sf0.1 fixtures (K key-shifted copies of
every scaled table; nation/region dims and all FK relationships stay
intact, so every catalog query runs unchanged), stages it with the
bench's own layout rule scaled by K, and times a heavy-query subset
under local[8] and local[32] in two fresh sessions.

Usage:
    python tools/core_scaling_probe.py [--copies 10] [--out sfdir]
        [--queries q5_local_supplier_volume,...]

Prints one markdown table: per query, 8-core and 32-core best-of-2 and
the ratio (t8/t32; 4.0 = perfect scaling for a 4x core difference).
Results land in SCALING.md's measured-core-scaling section. The data is
written under /tmp and deleted by the OS — never under /root/testdata
(read-only contract) and never consumed by bench.py or the oracle runs.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: key columns shifted per copy so FK joins stay consistent inside each
#: copy and never collide across copies (nation/region keys untouched —
#: the 25/5-row dims are shared by every copy, exactly like a larger SF)
SHIFT_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation"]
SHIFT = 1_000_000_000

DEFAULT_QUERIES = [
    "q1_pricing_summary",
    "q5_local_supplier_volume",
    "q7_volume_shipping",
    "x_dedup_exact",
    "x_minhash_lsh_candidates",
    "x_text_stats",
    "x_dsir_weights",
    "x_semdedup",
    "x_sparse_cosine_pairs",
    "x_curation_pipeline",
]


def synthesize(spark, src: str, dst: str, copies: int) -> None:
    from pyspark.sql import functions as F

    from bi_gcp_stitch_repl_spark.queries import catalog

    for name in DIMS:
        (df,) = catalog.tables(spark, src, name)
        df.write.mode("overwrite").parquet(f"{dst}/{name}.parquet")
    for name, cols in SHIFT_COLS.items():
        (df,) = catalog.tables(spark, src, name)
        out = None
        for i in range(copies):
            c = df
            for col in cols:
                c = c.withColumn(col, F.col(col) + F.lit(i * SHIFT))
            out = c if out is None else out.unionByName(c)
        # bench layout rule scaled by the copy count (files ~ input size)
        import bench as B

        n = B.STAGE_LAYOUT.get(name, 1)
        n = max(n, min(256, n * copies)) if n > 1 else copies
        out.repartition(n).write.mode("overwrite").parquet(
            f"{dst}/{name}.parquet"
        )


def run_arm(cpus: int, data_dir: str, names: list[str]) -> dict[str, float]:
    from pyspark.sql import SparkSession

    from bi_gcp_stitch_repl_spark.queries import catalog
    from bi_gcp_stitch_repl_spark.session import get_spark

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    spark = get_spark(app_name=f"corescale{cpus}", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    q = catalog.queries()
    out: dict[str, float] = {}
    for n in names:  # warm
        q[n](spark, data_dir).write.format("noop").mode("overwrite").save()
    for n in names:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            q[n](spark, data_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.time() - t0)
        out[n] = best
    spark.stop()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="")
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    args = ap.parse_args()
    names = [n for n in args.queries.split(",") if n]

    dst = args.out or tempfile.mkdtemp(prefix="corescale_sf1_")
    if not os.path.exists(f"{dst}/lineitem.parquet"):
        from bi_gcp_stitch_repl_spark.session import get_spark

        spark = get_spark(app_name="corescale_gen", master="local[32]")
        spark.sparkContext.setLogLevel("ERROR")
        t0 = time.time()
        synthesize(spark, args.src, dst, args.copies)
        print(f"synthesized {args.copies}x at {dst} in {time.time()-t0:.1f}s")
        spark.stop()

    t32 = run_arm(32, dst, names)
    t8 = run_arm(8, dst, names)
    print(f"\n| query | 8 cores | 32 cores | ratio (t8/t32) |")
    print("|---|---|---|---|")
    for n in names:
        r = t8[n] / t32[n] if t32[n] else float("nan")
        print(f"| {n} | {t8[n]:.2f} | {t32[n]:.2f} | {r:.2f} |")


if __name__ == "__main__":
    main()
