"""Streaming JSONL corpus ingest: incremental, exactly-once, quarantined."""

from __future__ import annotations

import json

from bi_gcp_stitch_repl_spark.sinks.versioned import VersionedTable
from bi_gcp_stitch_repl_spark.streaming.ingest import ingest_documents_stream


def _shard(src_dir, name, rows, corrupt=()):
    lines = [json.dumps(r) for r in rows] + list(corrupt)
    (src_dir / name).write_text("\n".join(lines))


def _run(spark, src, clean_t, quar_t, ckpt):
    q = ingest_documents_stream(
        spark, str(src), clean_t, quar_t, app_id="ingest-test", checkpoint=str(ckpt)
    ).start()
    q.awaitTermination(120)


def test_incremental_ingest_two_shards_with_quarantine(spark, tmp_path):
    src = tmp_path / "landing"
    src.mkdir()
    clean_t = VersionedTable(spark, str(tmp_path / "docs"))
    quar_t = VersionedTable(spark, str(tmp_path / "bad"))
    ckpt = tmp_path / "ckpt"

    _shard(
        src,
        "s1.jsonl",
        [
            {"doc_id": 1, "text": "abc", "lang": "en", "source": "w"},
            {"doc_id": 2, "text": "defgh", "lang": "de", "source": "w"},
        ],
        corrupt=["notjson"],
    )
    _run(spark, src, clean_t, quar_t, ckpt)
    got = {(r.doc_id, r.n_chars) for r in clean_t.read().collect()}
    assert got == {(1, 3), (2, 5)}
    assert [r.raw_line for r in quar_t.read().collect()] == ["notjson"]

    # second shard: only the NEW file is processed (checkpoint advances)
    _shard(src, "s2.jsonl", [{"doc_id": 3, "text": "x", "lang": "en", "source": "w"}])
    _run(spark, src, clean_t, quar_t, ckpt)
    assert clean_t.read().count() == 3
    assert quar_t.read().count() == 1

    # no new files: a third run must be a complete no-op (no dup appends)
    v_clean, v_bad = clean_t.latest_version(), quar_t.latest_version()
    _run(spark, src, clean_t, quar_t, ckpt)
    assert clean_t.read().count() == 3
    assert (clean_t.latest_version(), quar_t.latest_version()) == (v_clean, v_bad)


def test_replayed_batch_is_noop(spark, tmp_path):
    """Crash-replay model: re-delivering an already-committed (app, batch)
    to append_txn must not duplicate rows — the exactly-once half the
    checkpoint alone can't give foreachBatch."""
    src = tmp_path / "landing"
    src.mkdir()
    clean_t = VersionedTable(spark, str(tmp_path / "docs"))
    quar_t = VersionedTable(spark, str(tmp_path / "bad"))
    _shard(src, "s1.jsonl", [{"doc_id": 1, "text": "abc", "lang": "en", "source": "w"}])
    _run(spark, src, clean_t, quar_t, tmp_path / "ckpt")
    assert clean_t.read().count() == 1

    replay = clean_t.read()  # same shape as the committed batch 0 output
    clean_t.append_txn(replay, app_id="ingest-test", batch_id=0)
    assert clean_t.read().count() == 1


def test_max_files_per_trigger_bounds_batches(spark, tmp_path):
    """A 3-shard backlog with maxFilesPerTrigger=1 drains fully under
    availableNow, but as MULTIPLE bounded micro-batches — each one a
    separate exactly-once table commit."""
    from bi_gcp_stitch_repl_spark.streaming.ingest import ingest_documents_stream

    src = tmp_path / "landing"
    src.mkdir()
    for s in range(3):
        _shard(
            src,
            f"s{s}.jsonl",
            [{"doc_id": s * 10 + i, "text": "x", "lang": "en", "source": "w"}
             for i in range(4)],
        )
    clean_t = VersionedTable(spark, str(tmp_path / "docs"))
    quar_t = VersionedTable(spark, str(tmp_path / "bad"))
    q = ingest_documents_stream(
        spark,
        str(src),
        clean_t,
        quar_t,
        app_id="bounded",
        checkpoint=str(tmp_path / "ck"),
        max_files_per_trigger=1,
    ).start()
    q.awaitTermination(120)
    assert clean_t.read().count() == 12
    # one commit per micro-batch -> at least 3 data versions on the table
    assert clean_t.latest_version() >= 2
