"""The shipped examples must actually run (no doc rot)."""

from __future__ import annotations

import sys


def test_curate_corpus_example_end_to_end(spark, tmp_path):
    sys.path.insert(0, "examples")
    try:
        import curate_corpus
    finally:
        sys.path.pop(0)
    stats = curate_corpus.run(str(tmp_path))
    assert stats["ingested"] == 200
    assert stats["quarantined"] == 1
    # shards exported for every split
    out = spark.read.parquet(str(tmp_path / "shards"))
    assert {r.split for r in out.select("split").distinct().collect()} == {
        "train",
        "valid",
        "test",
    }
