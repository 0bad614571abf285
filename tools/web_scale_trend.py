"""Web-front scale evidence (VERDICT r06 #6 → PERF.md).

Two questions the bench numbers alone can't answer:

1. **Does prepare_web_corpus scale linearly in corpus size?** Run the
   full front (URL canonicalize + keep-first dedup → HTML extract →
   bloom→exact decontamination) on a constructed crawl at 1× and 10× the
   sf0.1 document mass and compare wall clock. Every stage is row-local
   except the canonical-key window and the per-doc gram aggregation, so
   wall should track rows ~linearly (modulo fixed Spark overhead that
   FLATTERS the small run).

2. **What do m/k cost at 10× bench-gram mass?** The Bloom prefilter's
   false-positive rate decides how many clean docs pay the exact-pass
   gram comparison. Measure flagged-but-clean rate vs filter load
   (bench grams inserted / m) for the shipped geometry (m=131071, k=3)
   and a deliberately small filter, at 1× and 10× bench sizes.

The crawl is constructed exactly like queries/web.py's fixture (escaped
fixture text wrapped in trap-carrying boilerplate; per-parity URL
spellings so dup groups are real). Deterministic end to end — no
Date.now/random; 10× replicas perturb doc_id and append a token.

Usage: python tools/web_scale_trend.py [--scales 1,10]
Writes a markdown table to stdout; paste into PERF.md.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


#: scale-proportional URL space (the catalog fixture's 120-resource URL
#: space collapses ANY corpus to ≤120 rows after dedup — fine for the
#: oracle, useless for linearity): one resource per doc_id PAIR, two raw
#: spellings per resource (trailing slash + param order by parity), so
#: rows-out tracks rows-in at every scale and the dedup window does real
#: scale-proportional work
_URL_SCALED = (
    "concat('HTTPS://WWW.EXAMPLE', cast(doc_id % 3 as string), '.COM:443/p/',"
    " cast(doc_id div 2 as string),"
    " CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END,"
    " '?utm_source=rss',"
    " CASE WHEN doc_id % 2 = 0"
    "  THEN concat('&id=', cast(doc_id % 10 as string), '&z=1')"
    "  ELSE concat('&z=1', '&id=', cast(doc_id % 10 as string)) END)"
)


def build_crawl(spark, scale: int):
    from pyspark.sql import functions as F

    from bi_gcp_stitch_repl_spark.queries.web import _HTML_BUILD

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    if scale > 1:
        reps = spark.range(scale).select(F.col("id").alias("_rep"))
        docs = (
            docs.crossJoin(reps)
            .select(
                (F.col("doc_id") * scale + F.col("_rep")).alias("doc_id"),
                F.concat(
                    F.col("text"), F.lit(" rep"), F.col("_rep").cast("string")
                ).alias("text"),
                "lang",
                "source",
            )
        )
    return docs.select(
        "doc_id",
        F.expr(_URL_SCALED).alias("url"),
        F.expr(_HTML_BUILD).alias("html"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,10")
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from bi_gcp_stitch_repl_spark.functions.bloom import (
        BLOOM_K,
        BLOOM_M,
        bloom_decontaminate,
    )
    from bi_gcp_stitch_repl_spark.jobs.pipelines import prepare_web_corpus

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("web-scale-trend")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    base_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    # warm the JVM/codegen caches so the FIRST timed scale doesn't pay
    # session startup (it flattered the big run by ~2x before this)
    warm = build_crawl(spark, 1)
    prepare_web_corpus(
        spark, warm, base_docs.limit(20).select("doc_id", "text")
    ).count()

    print("\n## prepare_web_corpus wall vs corpus scale")
    print("| scale | rows in | rows out | wall (s) | s per 1e3 rows |")
    print("|---|---|---|---|---|")
    for scale in scales:
        crawl = build_crawl(spark, scale).persist()
        n_in = crawl.count()  # materialize input outside the timed region
        bench = base_docs.filter(F.col("doc_id") % 23 == 0).select(
            "doc_id", "text"
        )
        t0 = time.perf_counter()
        n_out = prepare_web_corpus(spark, crawl, bench).count()
        wall = time.perf_counter() - t0
        crawl.unpersist()
        print(
            f"| {scale}x | {n_in} | {n_out} | {wall:.2f} |"
            f" {1000 * wall / n_in:.3f} |"
        )

    print("\n## bloom FP economics vs bench-gram mass and geometry")
    print("| bench scale | m | k | bench grams | load (grams/m) |"
          " flagged | exact | FP rate (clean docs flagged) |")
    print("|---|---|---|---|---|---|---|---|")
    train = base_docs.select("doc_id", "text").persist()
    n_train = train.count()
    for bscale in scales:
        if bscale == 1:
            bench = base_docs.filter(F.col("doc_id") % 23 == 0)
        else:
            reps = spark.range(bscale).select(F.col("id").alias("_rep"))
            bench = (
                base_docs.filter(F.col("doc_id") % 23 == 0)
                .crossJoin(reps)
                .select(
                    (F.col("doc_id") * bscale + F.col("_rep")).alias("doc_id"),
                    F.concat(
                        F.col("text"),
                        F.lit(" bench"),
                        F.col("_rep").cast("string"),
                    ).alias("text"),
                )
            )
        bench = bench.select("doc_id", "text").persist()
        for m, k in ((BLOOM_M, BLOOM_K), (8191, BLOOM_K)):
            res = bloom_decontaminate(
                train, bench, n=8, m=m, k=k, audit_exact=True
            ).persist()
            flagged = res.filter("bloom_flagged").count()
            exact = res.filter("exact_flagged").count()
            clean = n_train - exact
            fp = (flagged - exact) / clean if clean else 0.0
            # distinct bench grams = filter load numerator
            from bi_gcp_stitch_repl_spark.functions.curation import (
                word_ngram_expr,
            )

            grams = (
                bench.select(
                    F.explode(F.expr(word_ngram_expr("text", 8))).alias("g")
                )
                .distinct()
                .count()
            )
            res.unpersist()
            print(
                f"| {bscale}x | {m} | {k} | {grams} | {grams / m:.2f} |"
                f" {flagged} | {exact} | {fp:.4f} |"
            )
        bench.unpersist()


if __name__ == "__main__":
    main()
