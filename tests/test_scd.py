"""SCD2 dimension maintenance: first load, incremental close-out, no-op
suppression, in-batch change chains, untouched-key isolation."""

from __future__ import annotations

from bi_gcp_stitch_repl_spark.ops.scd import scd2_apply, scd2_merge
from bi_gcp_stitch_repl_spark.sinks.versioned import VersionedTable


def _batch(spark, rows):
    return spark.createDataFrame(rows, "k long, status string, ts long")


def _state(table):
    return {
        (r.k, r.valid_from): (r.status, r.valid_to, r.is_current)
        for r in table.read().collect()
    }


def test_first_load_all_current(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "dim"))
    scd2_merge(t, _batch(spark, [(1, "A", 10), (2, "X", 10)]), ["k"], "ts", ["status"])
    assert _state(t) == {
        (1, 10): ("A", None, True),
        (2, 10): ("X", None, True),
    }


def test_incremental_close_out_leaves_other_keys_untouched(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "dim"))
    scd2_merge(t, _batch(spark, [(1, "A", 10), (2, "X", 10)]), ["k"], "ts", ["status"])
    scd2_merge(t, _batch(spark, [(1, "B", 20)]), ["k"], "ts", ["status"])
    assert _state(t) == {
        (1, 10): ("A", 20, False),  # closed at the change instant
        (1, 20): ("B", None, True),
        (2, 10): ("X", None, True),  # never read, never rewritten
    }


def test_noop_change_is_suppressed(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "dim"))
    scd2_merge(t, _batch(spark, [(1, "A", 10)]), ["k"], "ts", ["status"])
    scd2_merge(t, _batch(spark, [(1, "A", 20)]), ["k"], "ts", ["status"])
    assert _state(t) == {(1, 10): ("A", None, True)}


def test_in_batch_chain_with_noop_middle(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "dim"))
    scd2_merge(
        t,
        _batch(spark, [(1, "A", 10), (1, "A", 15), (1, "B", 20), (1, "B", 25)]),
        ["k"],
        "ts",
        ["status"],
    )
    # A@15 and B@25 are no-ops against their surviving predecessors
    assert _state(t) == {
        (1, 10): ("A", 20, False),
        (1, 20): ("B", None, True),
    }


def test_apply_emits_only_affected_keys(spark):
    current = scd2_apply(
        None, _batch(spark, [(1, "A", 10), (2, "X", 10)]), ["k"], "ts", ["status"]
    )
    out = scd2_apply(
        current, _batch(spark, [(1, "B", 20)]), ["k"], "ts", ["status"]
    )
    assert sorted((r.k, r.valid_from) for r in out.collect()) == [(1, 10), (1, 20)]


def test_replayed_scd2_batch_is_fixpoint(spark, tmp_path):
    """Re-applying an already-applied change batch must reproduce the
    identical state: the batch rows equal the now-open versions, no-op
    suppression drops them, and the composite-key merge upserts
    identical rows. This is what makes the streaming wrapper safe under
    foreachBatch's at-least-once delivery WITHOUT txn marks."""
    t = VersionedTable(spark, str(tmp_path / "dim"))
    b1 = _batch(spark, [(1, "A", 10), (2, "X", 10)])
    b2 = _batch(spark, [(1, "B", 20)])
    scd2_merge(t, b1, ["k"], "ts", ["status"])
    scd2_merge(t, b2, ["k"], "ts", ["status"])
    expected = _state(t)
    scd2_merge(t, b2, ["k"], "ts", ["status"])  # replay
    assert _state(t) == expected
    scd2_merge(t, b1, ["k"], "ts", ["status"])  # even an OLD batch replay
    assert _state(t) == expected


def test_scd2_dimension_stream_applies_changes(spark, tmp_path):
    """AvailableNow change stream → materialized dimension; a second run
    over the same source is a no-op (checkpoint + fixpoint)."""
    import json

    from bi_gcp_stitch_repl_spark.streaming.jobs import scd2_dimension_stream

    src = tmp_path / "changes"
    src.mkdir()
    rows = [
        {"k": 1, "status": "A", "ts": 10},
        {"k": 2, "status": "X", "ts": 10},
        {"k": 1, "status": "B", "ts": 20},
    ]
    (src / "c1.jsonl").write_text("\n".join(json.dumps(r) for r in rows))
    t = VersionedTable(spark, str(tmp_path / "dim"))
    changes = (
        spark.readStream.schema("k long, status string, ts long")
        .json(str(src))
    )
    q = scd2_dimension_stream(
        changes, t, ["k"], "ts", ["status"], checkpoint=str(tmp_path / "ck")
    ).start()
    q.awaitTermination(120)
    assert _state(t) == {
        (1, 10): ("A", 20, False),
        (1, 20): ("B", None, True),
        (2, 10): ("X", None, True),
    }


def test_apply_rejects_late_arriving_batch(spark):
    """scd2_apply's monotone-batch contract fails LOUDLY: a batch ts
    earlier than the key's open valid_from raises at execution instead of
    silently splicing an overlapping interval into unread closed
    history."""
    import pytest

    current = scd2_apply(
        None, _batch(spark, [(1, "A", 10), (1, "B", 20)]), ["k"], "ts", ["status"]
    )
    out = scd2_apply(
        current, _batch(spark, [(1, "C", 15)]), ["k"], "ts", ["status"]
    )
    with pytest.raises(Exception, match="late-arriving"):
        out.collect()


def test_merge_splices_late_change_between_versions(spark, tmp_path):
    """scd2_merge routes late keys through a full-history rebuild: a
    change landing BETWEEN two existing versions splices in with correct
    non-overlapping intervals (the adjacent closed row's valid_to is
    adjusted — the silent-overlap corruption the pure apply rejects)."""
    t = VersionedTable(spark, str(tmp_path / "dim"))
    scd2_merge(t, _batch(spark, [(1, "A", 10)]), ["k"], "ts", ["status"])
    scd2_merge(t, _batch(spark, [(1, "B", 20)]), ["k"], "ts", ["status"])
    scd2_merge(t, _batch(spark, [(1, "C", 15)]), ["k"], "ts", ["status"])  # late
    assert _state(t) == {
        (1, 10): ("A", 15, False),
        (1, 15): ("C", 20, False),
        (1, 20): ("B", None, True),
    }


def test_merge_late_noop_deletes_obsoleted_version(spark, tmp_path):
    """A late row that makes its existing successor a no-op must DELETE
    that successor, not leave two current rows for the key."""
    t = VersionedTable(spark, str(tmp_path / "dim"))
    scd2_merge(t, _batch(spark, [(1, "A", 10)]), ["k"], "ts", ["status"])
    scd2_merge(t, _batch(spark, [(1, "B", 20)]), ["k"], "ts", ["status"])
    # late B@15: rebuild keeps A@10→15, B@15→∞; existing B@20 is obsolete
    scd2_merge(t, _batch(spark, [(1, "B", 15)]), ["k"], "ts", ["status"])
    assert _state(t) == {
        (1, 10): ("A", 15, False),
        (1, 15): ("B", None, True),
    }


def test_merge_mixed_late_and_on_time_batch(spark, tmp_path):
    """One batch carrying a late key and an on-time key: only the late
    key pays the history-rebuild path; both land correctly."""
    t = VersionedTable(spark, str(tmp_path / "dim"))
    scd2_merge(
        t, _batch(spark, [(1, "A", 10), (2, "X", 10)]), ["k"], "ts", ["status"]
    )
    scd2_merge(t, _batch(spark, [(1, "B", 20)]), ["k"], "ts", ["status"])
    scd2_merge(
        t, _batch(spark, [(1, "C", 15), (2, "Y", 30), (3, "N", 5)]),
        ["k"], "ts", ["status"],
    )
    assert _state(t) == {
        (1, 10): ("A", 15, False),
        (1, 15): ("C", 20, False),
        (1, 20): ("B", None, True),
        (2, 10): ("X", 30, False),
        (2, 30): ("Y", None, True),
        (3, 5): ("N", None, True),
    }


def test_merge_read_error_on_existing_table_raises(spark):
    """A transient read() failure on an EXISTING table must propagate —
    the old try/except treated it as 'first load' and overwrote all
    history with the batch's keys."""
    import pytest

    class FlakyTable:
        def exists(self):
            return True

        def read(self):
            raise IOError("transient FS hiccup")

        def overwrite(self, df):
            raise AssertionError("must not overwrite on read failure")

    with pytest.raises(IOError):
        scd2_merge(
            FlakyTable(), _batch(spark, [(1, "A", 10)]), ["k"], "ts", ["status"]
        )


def test_same_ts_correction_replaces_open_version(spark, tmp_path):
    """A batch row at EXACTLY the open row's valid_from with different
    tracked values is a correction: it replaces the version in place —
    never a zero-length closed interval sharing the (key, valid_from)
    merge key."""
    t = VersionedTable(spark, str(tmp_path / "dim"))
    scd2_merge(t, _batch(spark, [(1, "A", 10)]), ["k"], "ts", ["status"])
    scd2_merge(t, _batch(spark, [(1, "B", 10)]), ["k"], "ts", ["status"])
    assert _state(t) == {(1, 10): ("B", None, True)}
    # and against CLOSED history via the late path: correcting ts=10
    # after a later version exists
    scd2_merge(t, _batch(spark, [(1, "C", 20)]), ["k"], "ts", ["status"])
    scd2_merge(t, _batch(spark, [(1, "D", 10)]), ["k"], "ts", ["status"])
    assert _state(t) == {
        (1, 10): ("D", 20, False),
        (1, 20): ("C", None, True),
    }


def test_crash_window_replay_self_repairs_duplicate_current(spark, tmp_path):
    """Review-r04: the late path's documented crash window (merge landed,
    stale-row delete didn't) leaves TWO is_current rows for the key.
    Late-key detection must use MAX of the open valid_from — mirroring
    scd2_apply's monotone assert — so the replayed batch routes through
    the rebuild and deletes the stale row. With MIN, the replay routed
    on-time, tripped the assert, and wedged the stream forever."""
    from pyspark.sql import functions as F

    # late row (Y @20) carries the SAME tracked value as the open
    # successor (Y @30): the rebuild makes the successor a no-op, so the
    # splice OBSOLETES it — exactly the case where the stale-row delete
    # matters and a crash before it leaves a duplicate-current anomaly
    def build(path):
        t = VersionedTable(spark, path)
        scd2_merge(t, _batch(spark, [(1, "X", 10)]), ["k"], "ts", ["status"])
        scd2_merge(t, _batch(spark, [(1, "Y", 30)]), ["k"], "ts", ["status"])
        return t

    late = _batch(spark, [(1, "Y", 20)])
    t = build(str(tmp_path / "dim"))
    scd2_merge(t, late, ["k"], "ts", ["status"])  # clean run
    want = sorted(
        (r["status"], r["valid_from"], r["is_current"])
        for r in t.read().collect()
    )
    assert want == [("X", 10, False), ("Y", 20, True)]  # Y@30 obsoleted

    # forge the crash window: land the spliced rows WITHOUT the stale-row
    # delete — the obsoleted Y@30 open row survives alongside Y@20 open
    t2 = build(str(tmp_path / "dim_crashed"))
    t2.merge_upsert(t.read(), keys=["k", "valid_from"])
    assert t2.read().filter(F.col("is_current")).count() == 2  # anomaly

    # replay the late batch: must NOT raise, and must repair the table
    scd2_merge(t2, late, ["k"], "ts", ["status"])
    got = sorted(
        (r["status"], r["valid_from"], r["is_current"])
        for r in t2.read().collect()
    )
    assert got == want
    assert t2.read().filter(F.col("is_current")).count() == 1
