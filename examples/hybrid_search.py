"""Hybrid (lexical + semantic) retrieval example: BM25 ⊕ IVF-ANN fused
by reciprocal rank.

Run self-contained against the sf0.001 testdata:

    python examples/hybrid_search.py [sf_dir]

This is the deployment form of the catalog's ``x_hybrid_search_rrf``:
the catalog query scores the semantic side with an exact brute-force
scan (its oracle must be hash-checkable); here the semantic list comes
from the IVF index instead — the swap the ``rrf_fuse`` seam exists for.
Stages:

1. BM25 top-20 for a query term bag (``text.bm25_scores``);
2. IVF index over the embeddings (``similarity.kmeans_ivf_index``,
   random-init coarse cells) and semantic top-20 for a query vector
   via ``similarity.ivf_topk`` (multi-probe);
3. ``similarity.rrf_fuse`` over the two 20-row rank lists → top-10;
4. the audit habit: IVF-list recall vs the exact brute-force list.
"""

from __future__ import annotations

import sys

DEPTH = 20
K = 10


def run(sf_dir: str) -> list:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from bi_gcp_stitch_repl_spark.functions.similarity import (
        brute_force_topk,
        ivf_topk,
        kmeans_ivf_index,
        rrf_fuse,
    )
    from bi_gcp_stitch_repl_spark.functions.text import bm25_scores
    from bi_gcp_stitch_repl_spark.queries.catalog import tables
    from bi_gcp_stitch_repl_spark.session import get_spark

    spark = get_spark(app_name="example:hybrid-search")
    docs, emb = tables(spark, sf_dir, "documents", "embeddings")

    # --- 1. lexical list: BM25 top-DEPTH for a term bag --------------------
    lex = (
        bm25_scores(docs.filter(F.col("doc_id") != 0), ["join", "window", "merge"])
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(DEPTH)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("bm25"), "doc_id"))
            .alias("lex_rank"),
        )
    )

    # --- 2. semantic list: IVF-probed top-DEPTH for item 0's vector --------
    indexed = kmeans_ivf_index(
        emb, n_cells=8, seed=42, max_iter=4, init_mode="random"
    ).localCheckpoint(eager=True)
    qvec = indexed.filter(F.col("vec_id") == 0).select(
        F.lit(0).alias("query_id"), "embedding"
    )
    corpus = indexed.filter(F.col("vec_id") != 0)
    sem = ivf_topk(
        corpus, qvec, k=DEPTH, n_probe=5, centroid_col="ivf_cell"
    ).select(F.col("vec_id").alias("doc_id"), F.col("rk").alias("sem_rank"))

    # --- 3. fuse -----------------------------------------------------------
    fused = (
        rrf_fuse({"lex": lex, "sem": sem}, id_col="doc_id")
        .orderBy(F.desc("rrf_score"), "doc_id")
        .limit(K)
    )
    top = fused.collect()

    # --- 4. audit: IVF semantic list vs exact brute force ------------------
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    exact_ids = {
        r["vec_id"]
        for r in brute_force_topk(
            emb.filter(F.col("vec_id") != 0), qv, k=DEPTH
        ).collect()
    }
    ivf_ids = {r["doc_id"] for r in sem.collect()}
    recall = len(ivf_ids & exact_ids) / float(DEPTH)

    print(f"fused top-{K} (doc_id, lex_rank, sem_rank, rrf_score):")
    for r in top:
        print(f"  {r['doc_id']:>6}  {r['lex_rank']}  {r['sem_rank']}  "
              f"{r['rrf_score']:.6f}")
    print(f"IVF semantic recall@{DEPTH} vs brute force: {recall:.2f}")
    return top


if __name__ == "__main__":
    # `python examples/hybrid_search.py` puts examples/ (not the repo
    # root) on sys.path; add the root so the package imports
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    run(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
