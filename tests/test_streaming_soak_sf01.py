"""Opt-in sf0.1 streaming soak (VERDICT r03 #7): drive the two production
streaming sinks — ``incremental_merge_stream`` (S4 replication as
foreachBatch merge-upsert) and ``versioned_append_stream`` (exactly-once
commit-log append) — over the full sf0.1 ``events`` table in three
arrival waves, asserting exactly-once row accounting after every wave
and after a crash-recovery replay.

Run with:

    SPARK_GRAFT_CPUS=32 python -m pytest -m sf01 -q tests/test_streaming_soak_sf01.py

Deselected by default (pytest.ini ``addopts = -m "not sf01"``): it moves
100k rows through six-plus micro-batches twice (~2-4 min on local[32]).
"""

from __future__ import annotations

import os

import pytest

pytestmark = pytest.mark.sf01

SF01 = os.environ.get("SPARK_GRAFT_SWEEP_SF", "/root/testdata/sf0.1")

#: event_id upper bounds of the three arrival waves (sf0.1 has 100k events)
WAVES = (40_000, 80_000, 10**12)


def _waves(spark, tmp_path):
    """Split sf0.1 events into three parquet slice dirs, normalized through
    the catalog loader (so the ts generation quirks are handled) and cut
    to the streaming-stable columns."""
    from pyspark.sql import functions as F

    from bi_gcp_stitch_repl_spark.queries.catalog import tables

    (events,) = tables(spark, SF01, "events")
    src = events.select(
        "event_id", "user_id", "event_type", "value", "ts"
    )
    lo = 0
    dirs, counts = [], []
    for w, hi in enumerate(WAVES):
        sl = src.filter((F.col("event_id") >= lo) & (F.col("event_id") < hi))
        d = str(tmp_path / f"wave{w}")
        # 2 files per wave + maxFilesPerTrigger=1 => >= 2 micro-batches
        # per wave, >= 6 across the soak
        sl.repartition(2).write.parquet(d)
        dirs.append(d)
        counts.append(sl.count())
        lo = hi
    assert sum(counts) == src.count()
    return src.schema, dirs, counts


def _arrive(wave_dir: str, stream_src: str) -> None:
    """Move one wave's part files into the streamed directory."""
    os.makedirs(stream_src, exist_ok=True)
    for f in os.listdir(wave_dir):
        if f.endswith(".parquet"):
            os.rename(os.path.join(wave_dir, f), os.path.join(stream_src, f))


def test_streaming_soak_sf01_exactly_once(spark, tmp_path):
    from bi_gcp_stitch_repl_spark.sinks.merge import ParquetTable
    from bi_gcp_stitch_repl_spark.sinks.versioned import VersionedTable
    from bi_gcp_stitch_repl_spark.streaming.jobs import (
        incremental_merge_stream,
        versioned_append_stream,
    )

    schema, wave_dirs, counts = _waves(spark, tmp_path)
    stream_src = str(tmp_path / "arrivals")
    merge_t = ParquetTable(spark, str(tmp_path / "replica"))
    log_t = VersionedTable(spark, str(tmp_path / "ledger"))

    def run_wave():
        reader = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(stream_src)
        )
        q1 = incremental_merge_stream(
            reader, merge_t, keys=["event_id"],
            checkpoint=str(tmp_path / "ck_merge"),
        ).start()
        q1.awaitTermination(600)
        q2 = versioned_append_stream(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(stream_src),
            log_t, app_id="soak", checkpoint=str(tmp_path / "ck_log"),
        ).start()
        q2.awaitTermination(600)

    seen = 0
    for wave_dir, n in zip(wave_dirs, counts):
        _arrive(wave_dir, stream_src)
        run_wave()
        seen += n
        # exactly-once after EVERY wave, for both sinks
        assert merge_t.read().count() == seen
        assert log_t.read().count() == seen
        assert merge_t.read().select("event_id").distinct().count() == seen

    # >= 3 micro-batches total: each versioned append_txn commit is one
    # log version (2 files x 3 waves = 6 commits expected)
    assert (log_t.latest_version() or 0) + 1 >= 3

    # crash-recovery replay: re-running both sinks against their own
    # checkpoints with no new arrivals must be a no-op...
    run_wave()
    assert merge_t.read().count() == seen
    assert log_t.read().count() == seen

    # ...and a checkpoint-reset redelivery of EVERY batch with the same
    # app_id must be rejected by the table's own txn log, not the
    # (destroyed) checkpoint — end-to-end exactly-once under replay
    q = versioned_append_stream(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_src),
        log_t, app_id="soak", checkpoint=str(tmp_path / "ck_log_reset"),
    ).start()
    q.awaitTermination(600)
    assert log_t.read().count() == seen
    assert log_t.read().select("event_id").distinct().count() == seen
