"""PQ / IVF-PQ scale + recall trend (round 11 → PERF.md).

The pq.py pins prove exactness of the mechanics on fixtures; this
measures what matters at scale on the ann_scale_trend synthetic
CLUSTERED corpus (hash-trig centers + 15% noise, dim 64, all JVM-side):

- **train** on a FIXED 2k-vector slice (``vec_id < 2000`` — the
  documented production pattern: codebooks need a sample, not the
  store),
- **encode** the full corpus (the row-local literal-codebook
  projection — should track scan speed, no shuffle),
- **search** 20 queries through ivf_pq_topk (fitted coarse cells,
  n_probe = ceil(n_cells/8)) and report wall time plus recall@10
  against the exact brute-force L2 top-10 (PQ is lossy — the recall
  number is part of the evidence, not just the latency).

Deterministic end to end (hash-trig corpus, seeded KMeans, fixed query
ids). Usage: python tools/pq_scale_trend.py [--sizes 20000,200000,1000000]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 64
M = 8
K_CODES = 16
N_QUERIES = 20


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="20000,200000,1000000")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    from pyspark.sql import functions as F

    from bi_gcp_stitch_repl_spark.functions import pq
    from bi_gcp_stitch_repl_spark.functions.similarity import auto_n_cells
    from bi_gcp_stitch_repl_spark.session import get_spark
    from tools.ann_scale_trend import synth_corpus

    spark = get_spark(app_name="pq_scale_trend", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    print(
        "| vectors | n_cells | n_probe | train 2k | encode exact |"
        " encode fast | search 20q | recall@10 | refined search |"
        " refined recall@10 |"
    )
    print("|---|---|---|---|---|---|---|---|---|---|")
    exact_encode_cap = 200_000  # interpreted-fold twin: measured only
    #                             where it stays sane; fast path beyond
    for n in sizes:
        corpus = synth_corpus(spark, n).localCheckpoint(eager=True)
        queries = (
            synth_corpus(spark, n)
            .filter(F.col("vec_id") % (n // N_QUERIES) == 7)
            .limit(N_QUERIES)
            .selectExpr("vec_id AS query_id", "embedding")
            .localCheckpoint(eager=True)
        )
        n_cells = auto_n_cells(n)
        n_probe = max(1, math.ceil(n_cells / 8))

        t0 = time.time()
        sample = corpus.filter(F.col("vec_id") < 2000)
        index_s, centers, cbs = pq.ivf_pq_index(
            sample, dim=DIM, n_cells=n_cells, m=M, k_codes=K_CODES
        )
        cbs = cbs.localCheckpoint(eager=True)
        centers = centers.localCheckpoint(eager=True)
        t_train = time.time() - t0

        # full-corpus encode against the FROZEN centers + codebooks:
        # the exact interpreted-fold twin (A) vs the Arrow/NumPy
        # production kernel (B)
        if n <= exact_encode_cap:
            t0 = time.time()
            ix_a, _, _ = pq.ivf_pq_index(
                corpus, dim=DIM, m=M, k_codes=K_CODES, centers=centers,
                codebooks=cbs,
            )
            ix_a.count()
            t_exact = f"{time.time() - t0:.1f} s"
        else:
            t_exact = "—"
        t0 = time.time()
        index, _, _ = pq.ivf_pq_index(
            corpus, dim=DIM, m=M, k_codes=K_CODES, centers=centers,
            codebooks=cbs, fast_encode=True,
        )
        index = index.localCheckpoint(eager=True)
        index.count()
        t_encode = time.time() - t0

        t0 = time.time()
        got = pq.ivf_pq_topk(
            index, centers, cbs, queries, k_top=10, n_probe=n_probe
        ).collect()
        t_search = time.time() - t0

        t0 = time.time()
        got_ref = pq.ivf_pq_topk(
            index, centers, cbs, queries, k_top=10, n_probe=n_probe,
            refine_with=corpus, refine_factor=5,
        ).collect()
        t_refine = time.time() - t0

        # exact brute-force L2 top-10 per query
        exact = (
            corpus.crossJoin(F.broadcast(queries.selectExpr(
                "query_id", "embedding AS qv")))
            .select(
                "query_id", "vec_id",
                F.expr(
                    "aggregate(zip_with(embedding, qv,"
                    " (x, y) -> (x - y) * (x - y)),"
                    " cast(0.0 as double), (acc, v) -> acc + v)"
                ).alias("d"),
            )
        )
        from pyspark.sql.window import Window

        w = Window.partitionBy("query_id").orderBy("d", "vec_id")
        ex = (
            exact.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 10)
            .collect()
        )
        truth: dict = {}
        for r in ex:
            truth.setdefault(r.query_id, set()).add(r.vec_id)
        def mean_recall(rows):
            mine: dict = {}
            for r in rows:
                mine.setdefault(r.query_id, set()).add(r.vec_id)
            rs = [
                len(mine.get(q, set()) & vs) / len(vs)
                for q, vs in truth.items()
            ]
            return sum(rs) / len(rs)

        print(
            f"| {n:,} | {n_cells} | {n_probe} | {t_train:.1f} s |"
            f" {t_exact} | {t_encode:.1f} s | {t_search:.1f} s |"
            f" {mean_recall(got):.2f} | {t_refine:.1f} s |"
            f" {mean_recall(got_ref):.2f} |"
        )


if __name__ == "__main__":
    main()
