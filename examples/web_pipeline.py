"""End-to-end WEB-CRAWL curation example: raw (url, html) pages →
robots.txt exclusion → URL-dedup → HTML extraction → two-tier
decontamination → the standard curation stack → hive-partitioned
training shards, plus the crawl's own domain-authority signal.

Run self-contained (writes under a scratch dir):

    python examples/web_pipeline.py /tmp/web_demo

The same code path a production crawl run uses — only the fabricated
crawl and the scale differ. Stages:

1. fabricate a crawl: every resource is fetched TWICE under different
   raw URL spellings (mixed case, default port, tracking params, param
   order, trailing slash), pages carry script/style/comment boilerplate
   around the text, every third page links a hub domain, a few pages
   embed a benchmark 8-gram, and site3.com serves a /private/ section
   its robots.txt disallows;
2. ``jobs.pipelines.prepare_web_corpus(robots=...)``: robots exclusion
   FIRST (politeness before any spend) → canonical-URL keep-first dedup
   BEFORE any HTML parse → ``html_text_expr`` extraction on survivors →
   Bloom-prefilter + exact-verify decontamination;
3. ``jobs.pipelines.rank_domains`` over the robots-surviving crawl: the
   Common-Crawl-style authority signal from the corpus's own link graph
   (the hub domain must come out on top);
4. ``jobs.pipelines.prepare_training_data`` on the cleaned documents:
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
        # every third resource endorses the hub domain — the link graph
        # rank_domains solves below
        link = (
            '<a href="https://hub-site.com/ref">hub</a>' if rid % 3 == 0 else ""
        )
        html = (
            "<html><head><SCRIPT>var t = 1 < 2;</SCRIPT>"
            "<style>p { color: red; }</style></head><body>"
            f"<h1>Page &#39;{rid}&#39;</h1><!-- nav -->{link}"
            f"<p>{texts[rid]}</p>"
            "</body></html>"
        )
        return Row(doc_id=pid, url=url, html=html)

    pages = [page(2 * r + d, r, bool(d)) for r in range(120) for d in (0, 1)]
    # site3.com also serves a robots-disallowed /private/ section: these
    # pages must vanish at the politeness gate, before any parse/dedup
    pages += [
        Row(
            doc_id=500 + i,
            url=f"https://site3.com/private/{i}",
            html=f"<html><body><p>do not ingest {i}</p></body></html>",
        )
        for i in range(4)
    ]
    crawl = spark.createDataFrame(pages)
    robots = spark.createDataFrame(
        [Row(host="site3.com", robots_txt="User-agent: *\nDisallow: /private/")]
    )
    bench = spark.createDataFrame([Row(doc_id=10_000, text=bench_gram)])

    docs = prepare_web_corpus(
        spark, crawl, bench, text_col="text", robots=robots
    )
    n_docs = docs.count()

    from bi_gcp_stitch_repl_spark.functions.web import apply_robots
    from bi_gcp_stitch_repl_spark.jobs.pipelines import rank_domains

    ranks = rank_domains(apply_robots(crawl, robots)).orderBy(
        F.desc("rank_fp"), "domain"
    )
    top = ranks.first()

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
    stats["top_domain"] = top["domain"]
    stats["n_domains"] = ranks.count()
    return stats


if __name__ == "__main__":
    # `python examples/web_pipeline.py` puts examples/ (not the repo
    # root) on sys.path; add the root so the package imports
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    out = run(sys.argv[1] if len(sys.argv) > 1 else "/tmp/web_demo")
    print(json.dumps(out, indent=2, default=str))
