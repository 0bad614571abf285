"""Regenerate tests/window_snapshot.json after a driver-window rotation.

Run this in the SAME commit that edits ``catalog._PRIORITY``: the layout
test (`test_changed_queries_hold_window_slots`) compares current query /
library hashes against the snapshot and requires every changed entry to
hold a window slot — regenerating the snapshot is the explicit "the
window now accounts for these changes" acknowledgment.

Prints what changed so the rotation can be checked against it.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests import window_policy  # noqa: E402


def main() -> None:
    changed_q, changed_l = window_policy.changed_since_snapshot()
    if changed_q:
        print("changed queries:", ", ".join(sorted(changed_q)))
    if changed_l:
        print("changed libraries:", ", ".join(sorted(changed_l)))
    if not changed_q and not changed_l:
        print("no changes vs snapshot")

    # REFUSE to absolve a change whose window slot is missing: writing
    # the snapshot is the acknowledgment, so the slot must exist FIRST
    # (otherwise a regenerate-then-commit flow silently skips the
    # policy the layout test enforces).
    from bi_gcp_stitch_repl_spark.queries import catalog

    first50 = set(list(catalog.queries())[:50])
    stale_q = sorted(changed_q - first50)
    stale_l = {
        lib: sorted(set(window_policy.LIB_CANARIES[lib]) - first50)
        for lib in changed_l
        if set(window_policy.LIB_CANARIES[lib]) - first50
    }
    if stale_q or stale_l:
        # --migrate-hash-definition: ONLY for the commit that changes
        # window_policy.compute_hashes itself — every old-snapshot hash
        # mismatches the new definition, so the slot check is vacuous;
        # the rotation must then be validated by hand (e.g. diff the
        # EVALUATED oracles against the previous snapshot commit). The
        # flag is only HONORED when window_policy.py actually differs
        # from the snapshot commit (its own hash is recorded in the
        # snapshot) — otherwise any rotation could pass it and silently
        # regenerate without slots for changed queries.
        if "--migrate-hash-definition" in sys.argv:
            snap = window_policy.load_snapshot() or {}
            cur_policy = window_policy.compute_hashes()["policy"]
            if snap.get("policy") == cur_policy:
                print(
                    "REFUSING --migrate-hash-definition: tests/"
                    "window_policy.py is unchanged since the snapshot — "
                    "the bypass is only for hash-definition migrations."
                )
                raise SystemExit(1)
            print(
                "WARNING: hash-definition migration — slot check skipped; "
                "validate the rotation manually"
            )
        else:
            if stale_q:
                print(f"REFUSING: changed queries without a window slot: {stale_q}")
            if stale_l:
                print(f"REFUSING: changed libraries whose canaries lack slots: {stale_l}")
            print("Edit catalog._PRIORITY first, then rerun this tool.")
            raise SystemExit(1)

    cur = window_policy.compute_hashes()
    with open(window_policy.SNAPSHOT_PATH, "w") as f:
        json.dump(cur, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {window_policy.SNAPSHOT_PATH}")


if __name__ == "__main__":
    main()
