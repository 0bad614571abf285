"""End-to-end WEB-CRAWL curation example: raw (url, html) pages →
URL-dedup → HTML extraction → two-tier decontamination → the standard
curation stack → hive-partitioned training shards.

Run self-contained (writes under a scratch dir):

    python examples/web_pipeline.py /tmp/web_demo

The same code path a production crawl run uses — only the fabricated
crawl and the scale differ. Stages:

1. fabricate a crawl: every resource is fetched TWICE under different
   raw URL spellings (mixed case, default port, tracking params, param
   order, trailing slash), pages carry script/style/comment boilerplate
   around the text, and a few pages embed a benchmark 8-gram;
2. ``jobs.pipelines.prepare_web_corpus``: canonical-URL keep-first dedup
   BEFORE any HTML parse → ``html_text_expr`` extraction on survivors →
   Bloom-prefilter + exact-verify decontamination;
3. ``jobs.pipelines.prepare_training_data`` on the cleaned documents:
   span dedup → quality gate → (re-)decontamination → vocab encode →
   deterministic split + shard export.
"""

from __future__ import annotations

import json
import sys


def run(base: str) -> dict:
    import os

    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from bi_gcp_stitch_repl_spark.jobs.pipelines import (
        prepare_training_data,
        prepare_web_corpus,
    )
    from bi_gcp_stitch_repl_spark.session import get_spark

    spark = get_spark(app_name="example:web")

    bench_gram = "held out benchmark question answer pair number one"
    texts = [
        f"page {i} body text with several words of content variant {i % 5}"
        for i in range(120)
    ]
    # every 40th page embeds the benchmark 8-gram verbatim
    for i in range(0, 120, 40):
        texts[i] = f"intro {bench_gram} outro {i}"

    def page(pid: int, rid: int, dup: bool) -> Row:
        # two raw spellings of the same resource `rid`
        url = (
            f"https://site{rid % 4}.com/a/{rid}?id={rid}&z={rid % 3}"
            if not dup
            else (
                f"HTTPS://WWW.SITE{rid % 4}.COM:443/a/{rid}/"
                f"?utm_source=feed&z={rid % 3}&id={rid}#frag"
            )
        )
        html = (
            "<html><head><SCRIPT>var t = 1 < 2;</SCRIPT>"
            "<style>p { color: red; }</style></head><body>"
            f"<h1>Page &#39;{rid}&#39;</h1><!-- nav --><p>{texts[rid]}</p>"
            "</body></html>"
        )
        return Row(doc_id=pid, url=url, html=html)

    crawl = spark.createDataFrame(
        [page(2 * r + d, r, bool(d)) for r in range(120) for d in (0, 1)]
    )
    bench = spark.createDataFrame([Row(doc_id=10_000, text=bench_gram)])

    docs = prepare_web_corpus(spark, crawl, bench, text_col="text")
    n_docs = docs.count()

    stats = prepare_training_data(
        spark,
        docs.withColumn("source", F.lit("web")),
        bench,
        export_path=os.path.join(base, "shards"),
        vocab_size=300,
        n_shards=4,
        collect_stats=True,
    )
    stats["crawled_pages"] = crawl.count()
    stats["after_web_front"] = n_docs
    return stats


if __name__ == "__main__":
    # `python examples/web_pipeline.py` puts examples/ (not the repo
    # root) on sys.path; add the root so the package imports
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    out = run(sys.argv[1] if len(sys.argv) > 1 else "/tmp/web_demo")
    print(json.dumps(out, indent=2, default=str))
