"""ANN recall trend measurement (PERF.md "ANN recall" table, per round).

For a fixed 20-query audit set (smallest every-25th vec_ids — the same
deterministic set x_ivf_topk gates on), measures recall@k of the two
approximate paths against the exact brute-force top-k:

- IVF (kmeans_ivf_index + ivf_topk) across n_probe values;
- banded random-hyperplane LSH (lsh_bucket_topk) across plane counts.

Usage: python tools/ann_recall.py [--sf-dir ...] [--k 10]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from bi_gcp_stitch_repl_spark.functions import similarity as S
    from bi_gcp_stitch_repl_spark.queries.catalog import tables

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("ann-recall")
        .config("spark.sql.shuffle.partitions", args.cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    k = args.k

    (emb,) = tables(spark, args.sf_dir, "embeddings")
    # init_mode="random", max_iter=4, n_cells=auto sqrt(N) = the shipped
    # x_ivf_topk configuration (r06) — the trend must measure the
    # quantizer the driver gate actually runs, not a differently-
    # converged one
    n_cells = S.auto_n_cells(emb.count())
    indexed = S.kmeans_ivf_index(
        emb, n_cells=n_cells, seed=42, init_mode="random", max_iter=4
    ).localCheckpoint()
    queries = (
        indexed.filter(F.col("vec_id") % 25 == 0)
        .orderBy("vec_id")
        .limit(20)
        .select(F.col("vec_id").alias("query_id"), "embedding")
        .repartition(8, "query_id")
        .localCheckpoint()
    )

    # exact brute-force top-k per audit query (salted two-level window)
    q = queries.select("query_id", F.col("embedding").alias("qv"))
    w_local = Window.partitionBy("query_id", "_salt").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    exact = (
        emb.crossJoin(F.broadcast(q))
        .withColumn("cosine", S.cosine("embedding", "qv"))
        .withColumn("_salt", F.pmod(F.xxhash64("vec_id"), F.lit(64)))
        .withColumn("_lrk", F.row_number().over(w_local))
        .filter(F.col("_lrk") <= k)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "vec_id")
        .localCheckpoint()
    )

    def recall(approx):
        hits = (
            approx.join(exact, ["query_id", "vec_id"], "left_semi")
            .groupBy("query_id")
            .agg(F.count("*").alias("n"))
        )
        r = (
            queries.select("query_id")
            .join(hits, "query_id", "left")
            .select((F.coalesce(F.col("n"), F.lit(0)) / k).alias("rec"))
            .agg(F.avg("rec"))
            .collect()[0][0]
        )
        return r

    print(f"sf_dir={args.sf_dir} k={k} corpus={emb.count()} queries=20")
    # probe FRACTIONS of the auto-sized cell count (the scale-stable
    # knob; 0.625 is the shipped gate operating point)
    for frac in (0.3, 0.4, 0.5, 0.625, 0.75):
        n_probe = max(1, round(frac * n_cells))
        ivf = S.ivf_topk(indexed, queries, k=k, n_probe=n_probe, centroid_col="ivf_cell")
        print(
            f"IVF n_cells={n_cells} n_probe={n_probe} ({frac:.0%}): "
            f"recall@{k} = {recall(ivf):.3f}"
        )
    for n_planes in (2, 3, 4):
        lsh = S.lsh_bucket_topk(emb, queries, k=k, n_planes=n_planes)
        print(f"LSH n_planes={n_planes}: recall@{k} = {recall(lsh):.3f}")


if __name__ == "__main__":
    main()
