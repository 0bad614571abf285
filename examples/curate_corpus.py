"""End-to-end corpus curation example: raw JSONL shards → quarantined
ingest → curation stack → hive-partitioned training shards.

Run self-contained (writes under a scratch dir):

    python examples/curate_corpus.py /tmp/curate_demo

The same code path a production run uses — only the landing dir and
scale differ. Stages:

1. land two JSONL shards (one with a corrupt line);
2. exactly-once streaming ingest into clean + quarantine VersionedTables
   (`streaming.ingest.ingest_documents_stream`);
3. `jobs.pipelines.prepare_training_data`: span dedup → quality gate →
   benchmark decontamination → vocab encode → deterministic 90/5/5
   split + shard export.
"""

from __future__ import annotations

import json
import sys


def run(base: str) -> dict:
    from pyspark.sql import functions as F

    from bi_gcp_stitch_repl_spark.jobs.pipelines import prepare_training_data
    from bi_gcp_stitch_repl_spark.session import get_spark
    from bi_gcp_stitch_repl_spark.sinks.versioned import VersionedTable
    from bi_gcp_stitch_repl_spark.streaming.ingest import ingest_documents_stream

    spark = get_spark(app_name="example:curate")

    # --- 1. land raw shards -------------------------------------------------
    import os

    landing = os.path.join(base, "landing")
    os.makedirs(landing, exist_ok=True)
    docs = [
        {"doc_id": i, "text": f"doc {i} words repeat repeat alpha beta {i % 7}",
         "lang": "en", "source": "web" if i % 3 else "books"}
        for i in range(200)
    ]
    half = len(docs) // 2
    with open(os.path.join(landing, "shard-000.jsonl"), "w") as f:
        f.write("\n".join(json.dumps(d) for d in docs[:half]))
        f.write("\nthis line is not json\n")
    with open(os.path.join(landing, "shard-001.jsonl"), "w") as f:
        f.write("\n".join(json.dumps(d) for d in docs[half:]))

    # --- 2. exactly-once ingest --------------------------------------------
    clean_t = VersionedTable(spark, os.path.join(base, "docs"))
    quar_t = VersionedTable(spark, os.path.join(base, "quarantine"))
    # availableNow stream: wait for ACTUAL completion — a timed
    # awaitTermination returning False would silently proceed to read a
    # partially-ingested corpus while the stream is still appending
    if not ingest_documents_stream(
        spark, landing, clean_t, quar_t,
        app_id="example-ingest",
        checkpoint=os.path.join(base, "ckpt"),
    ).start().awaitTermination(600):
        raise TimeoutError("ingest stream did not finish within 600s")

    corpus = clean_t.read()
    bench = corpus.filter(F.col("doc_id") % 23 == 0)  # held-out eval slice
    train = corpus.filter(F.col("doc_id") % 23 != 0)

    # --- 3. curation stack + shard export ----------------------------------
    stats = prepare_training_data(
        spark, train, bench,
        export_path=os.path.join(base, "shards"),
        vocab_size=500, n_shards=4, collect_stats=True,
    )
    stats["ingested"] = corpus.count()
    stats["quarantined"] = quar_t.read().count()
    return stats


if __name__ == "__main__":
    # `python examples/curate_corpus.py` puts examples/ (not the repo
    # root) on sys.path; add the root so the package imports
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    out = run(sys.argv[1] if len(sys.argv) > 1 else "/tmp/curate_demo")
    print(json.dumps(out, indent=2, default=str))
