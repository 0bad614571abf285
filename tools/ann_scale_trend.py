"""IVF recall/cost trend vs corpus scale (VERDICT r05 #5 → PERF.md).

The fixture corpora (500/2 k vectors, n_cells=8) are toy-sized; this tool
measures the cells-grow-with-corpus rule (``similarity.auto_n_cells`` ≈
sqrt(N)) on synthetic embedding corpora at 1×/10×/100× the sf0.1 fixture
size (2 k → 20 k → 200 k vectors, dim 64), with CLUSTERED geometry (a
deterministic Gaussian-mixture-like construction: hash-derived cluster
centers + per-vector noise — real embedding corpora are clustered; the
near-uniform fixture is the adversarial case and keeps its own pinned
audit in ann_recall.py / x_ivf_topk).

For each scale: fit KMeans with n_cells=auto(√N), then measure mean
recall@5 and @10 over a fixed 20-query audit set against the exact
brute-force top-k, for n_probe as a FRACTION of n_cells (the scale-stable
probe knob) plus the fixed n_probe=5 point. Probe cost is reported as the
scored-candidate fraction of the corpus.

Everything is deterministic (hash-trig pseudo-randomness, fixed seeds) so
the trend is reproducible round over round.

Usage: python tools/ann_scale_trend.py [--sizes 2000,20000,200000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 64
CLUSTER_SIZE = 50  # vectors per natural cluster (real-corpus-ish)


def synth_corpus(spark, n: int):
    """Deterministic clustered corpus: cluster centers on the unit-ish
    sphere via hash-trig, vectors = center + 15% noise. All JVM-side
    expressions — no Python row loop, no rand() (rerun-stable)."""
    from pyspark.sql import functions as F

    n_clusters = max(4, n // CLUSTER_SIZE)
    center = (
        f"transform(sequence(0, {DIM - 1}),"
        f" j -> sin(cast((vec_id % {n_clusters}) * 73856093 + j * 19349663 as double)))"
    )
    noise = (
        f"transform(sequence(0, {DIM - 1}),"
        f" j -> 0.15D * sin(cast(vec_id * 83492791 + j * 123457 as double)))"
    )
    return (
        spark.range(n)
        .select(F.col("id").alias("vec_id"))
        .repartition(32)
        .select(
            "vec_id",
            F.expr(f"zip_with({center}, {noise}, (c, e) -> c + e)").alias(
                "embedding"
            ),
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="2000,20000,200000")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from bi_gcp_stitch_repl_spark.functions import similarity as S

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("ann-scale-trend")
        .config("spark.sql.shuffle.partitions", args.cpus)
        .config("spark.sql.adaptive.enabled", "true")
        # the 200 k corpus is ~100 MB of vectors; local-mode's 1 g default
        # driver heap can't hold the broadcast build + checkpoint blocks
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    for n in [int(s) for s in args.sizes.split(",")]:
        corpus = synth_corpus(spark, n).localCheckpoint()
        n_cells = S.auto_n_cells(n)
        t0 = time.time()
        indexed = S.kmeans_ivf_index(
            corpus, n_cells=n_cells, seed=42, max_iter=4, init_mode="random"
        ).localCheckpoint()
        fit_sec = time.time() - t0
        step = max(1, n // 20)
        queries = (
            corpus.filter(F.col("vec_id") % step == 0)
            .orderBy("vec_id")
            .limit(20)
            .select(F.col("vec_id").alias("query_id"), "embedding")
            .repartition(8, "query_id")
            .localCheckpoint()
        )
        k = 10
        q = queries.select("query_id", F.col("embedding").alias("qv"))
        w_local = Window.partitionBy("query_id", "_salt").orderBy(
            F.col("cosine").desc(), F.col("vec_id")
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("vec_id")
        )
        exact = (
            corpus.crossJoin(F.broadcast(q))
            .withColumn("cosine", S.cosine("embedding", "qv"))
            .withColumn("_salt", F.pmod(F.xxhash64("vec_id"), F.lit(64)))
            .withColumn("_lrk", F.row_number().over(w_local))
            .filter(F.col("_lrk") <= k)
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select("query_id", "vec_id", "rk")
            .localCheckpoint()
        )

        def recall_at(approx, kk):
            hits = (
                approx.filter(F.col("rk") <= kk)
                .join(
                    exact.filter(F.col("rk") <= kk).select("query_id", "vec_id"),
                    ["query_id", "vec_id"],
                    "left_semi",
                )
                .groupBy("query_id")
                .agg(F.count("*").alias("n"))
            )
            return (
                queries.select("query_id")
                .join(hits, "query_id", "left")
                .select((F.coalesce(F.col("n"), F.lit(0)) / kk).alias("rec"))
                .agg(F.avg("rec"))
                .collect()[0][0]
            )

        print(
            f"N={n} n_cells={n_cells} (auto sqrt) fit={fit_sec:.1f}s "
            f"clusters={max(4, n // CLUSTER_SIZE)}"
        )
        probes = sorted(
            {5, max(1, round(0.05 * n_cells)), max(1, round(0.10 * n_cells)),
             max(1, round(0.20 * n_cells))}
        )
        for n_probe in probes:
            t0 = time.time()
            ivf = S.ivf_topk(
                indexed, queries, k=k, n_probe=n_probe, centroid_col="ivf_cell"
            ).localCheckpoint()
            sec = time.time() - t0
            r5, r10 = recall_at(ivf, 5), recall_at(ivf, 10)
            frac = n_probe / n_cells
            print(
                f"  n_probe={n_probe:4d} ({frac:5.1%} of cells, "
                f"~{frac:5.1%} of corpus scored): recall@5={r5:.3f} "
                f"recall@10={r10:.3f} query={sec:.1f}s"
            )


if __name__ == "__main__":
    main()
