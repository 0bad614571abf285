"""VersionedTable: commit-log semantics — O(1) append, snapshot reads,
time travel, optimistic concurrency, vacuum."""

from __future__ import annotations

import json
import os

import pytest

from bi_gcp_stitch_repl_spark.sinks.versioned import CommitConflict, VersionedTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def test_append_is_add_only_and_time_travels(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    v0 = t.append(_df(spark, [(1, "a"), (2, "b")]))
    files_v0 = set(t.files_at(v0))
    v1 = t.append(_df(spark, [(3, "c")]))
    assert (v0, v1) == (0, 1)
    # append touched nothing: v0's files are a strict subset of v1's
    assert files_v0 < set(t.files_at(v1))
    assert t.read().count() == 3
    assert t.read(version=0).count() == 2  # time travel
    # commit log actions for v1 are adds only
    with open(os.path.join(t.log_path, f"{v1:012d}.json")) as f:
        assert all("add" in a for a in json.load(f)["actions"])


def test_overwrite_and_merge_preserve_history(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a"), (2, "b")]))
    t.merge_upsert(_df(spark, [(2, "B"), (9, "new")]), keys=["k"])
    now = {(r["k"], r["v"]) for r in t.read().collect()}
    assert now == {(1, "a"), (2, "B"), (9, "new")}
    before = {(r["k"], r["v"]) for r in t.read(version=0).collect()}
    assert before == {(1, "a"), (2, "b")}  # pre-merge snapshot intact
    t.overwrite(_df(spark, [(7, "z")]))
    assert t.read().count() == 1
    assert {(r["k"], r["v"]) for r in t.read(version=1).collect()} == now


def test_append_retries_past_commit_conflict(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a")]))
    # another writer steals version 1
    os.makedirs(t.log_path, exist_ok=True)
    with open(os.path.join(t.log_path, f"{1:012d}.json"), "x") as f:
        json.dump({"version": 1, "ts": 0, "actions": []}, f)
    v = t.append(_df(spark, [(2, "b")]))
    assert v == 2  # retried on top of the interloper
    assert t.read().count() == 2


def test_overwrite_conflict_raises(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a")]))

    class Stubborn(VersionedTable):
        def _next_version(self):
            return 1  # always target a version someone else will own

    s = Stubborn(spark, str(tmp_path / "t"))
    os.makedirs(t.log_path, exist_ok=True)
    with open(os.path.join(t.log_path, f"{1:012d}.json"), "x") as f:
        json.dump({"version": 1, "ts": 0, "actions": []}, f)
    with pytest.raises(CommitConflict):
        s.overwrite(_df(spark, [(2, "b")]))


def test_vacuum_drops_unreferenced_files_only(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a"), (2, "b")]))
    t.overwrite(_df(spark, [(3, "c")]))
    live_before = set(t.files_at())
    deleted = t.vacuum(retain_versions=1)
    assert deleted and set(deleted).isdisjoint(live_before)
    assert t.read().count() == 1  # latest snapshot untouched
    with pytest.raises(Exception):
        t.read(version=0).collect()  # old snapshot gone, as documented
