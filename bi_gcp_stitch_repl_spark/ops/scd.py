"""SCD Type-2 dimension maintenance (writer side).

``queries.relational_ext.x_scd2_intervals`` derives interval views from an
append-only log at query time; this module is the other half — maintaining
a materialized SCD2 dimension table across incremental change batches,
the standard warehouse pattern the reference's K7 history capture
(`/root/reference/dags/sql-queries/bexio_and_stripe/execute_bexio_and_stripe_sql_queries.py:45-57`)
approximates with append-only snapshots.

Scale contract: a batch touches ONLY the open (is_current) rows of the
keys it carries —

    affected open rows ⋈ batch  →  one window pass per key  →
    composite-key merge on (key, valid_from)

Closed history is never read, shuffled, or rewritten; with the
``VersionedTable`` sink the merge file-prunes on the batch's key range,
so the commit cost tracks the batch, not the dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: SCD2 bookkeeping columns added to the tracked payload
SCD2_COLS = ("valid_from", "valid_to", "is_current")


def scd2_apply(
    current: DataFrame | None,
    batch: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tracked_cols: list[str],
) -> DataFrame:
    """Pure-plan SCD2 state transition for the AFFECTED keys.

    ``current`` is the existing dimension state (keys + tracked columns +
    valid_from/valid_to/is_current), or None on first load. ``batch``
    carries (keys + tracked columns + ``ts_col``); ``(key, ts)`` must be
    unique within a batch (a change log's natural grain). Returns the
    replacement rows for every key present in the batch: closed-out prior
    versions plus the new open version — suitable for a composite-key
    merge on ``(*key_cols, valid_from)``. Keys absent from the batch are
    not in the output (their state is untouched).

    Consecutive no-op changes (tracked values equal to the key's previous
    version) are suppressed; suppression chains correctly (A,A,A keeps
    one row) because a row is dropped only when it equals its surviving
    predecessor.

    **Monotone-batch contract (enforced).** Because only the OPEN rows of
    affected keys are read, every batch timestamp must be ``>=`` its key's
    open ``valid_from``. Equality is a CORRECTION: the batch row replaces
    the open version at that instant (batch wins the (key, ts) tie — the
    same rule the late-path replay uses), so an idempotent replay of the
    same batch reproduces the identical row and a changed-value same-ts
    row updates it in place; two rows never share the composite
    ``(key, valid_from)`` merge key. A truly late-arriving change whose ts
    falls before the open row's valid_from would splice into CLOSED
    history this function never reads, silently overlapping an existing
    interval — so the plan carries an execution-time ``assert_true`` that
    fails the job loudly instead. Recovery for genuine late data: rebuild
    the affected keys from the full change log (replay through
    ``scd2_apply(None, full_log_for_keys, ...)``).
    """
    new_rows = batch.select(
        *key_cols,
        *[F.col(c) for c in tracked_cols],
        F.col(ts_col).alias("valid_from"),
        F.lit(1).alias("_src"),
    )
    if current is not None:
        batch_keys = batch.select(*key_cols).distinct()
        open_rows = (
            current.filter(F.col("is_current"))
            .join(batch_keys, on=key_cols, how="left_semi")
            .select(
                *key_cols,
                *[F.col(c) for c in tracked_cols],
                "valid_from",
                F.lit(0).alias("_src"),
            )
        )
        cand = open_rows.unionByName(new_rows)
        # Enforce the monotone-batch contract at execution time: a batch
        # row earlier than its key's open valid_from must fail the job,
        # not silently corrupt closed intervals. The assertion lives in a
        # Filter (assert_true yields NULL when the condition holds), so
        # column pruning cannot optimize it away.
        w_open = Window.partitionBy(*key_cols)
        open_vf = F.max(
            F.when(F.col("_src") == 0, F.col("valid_from"))
        ).over(w_open)
        ok = (
            (F.col("_src") == 0)
            | F.col("_open_vf").isNull()
            | (F.col("valid_from") >= F.col("_open_vf"))
        )
        cand = cand.withColumn("_open_vf", open_vf).filter(
            F.assert_true(
                ok,
                F.concat(
                    F.lit(
                        "scd2_apply: late-arriving change (batch ts "
                    ),
                    F.col("valid_from").cast("string"),
                    F.lit(" < open valid_from "),
                    F.col("_open_vf").cast("string"),
                    F.lit(") violates the monotone-batch contract; "
                          "rebuild the affected keys from the change log"),
                ),
            ).isNull()
        ).drop("_open_vf")
    else:
        cand = new_rows

    # (key, valid_from) ties resolve to the batch row (_src=1): an
    # equal-ts change is a correction of the version starting at that
    # instant — keeping both rows would emit a zero-length closed
    # interval SHARING the open row's composite merge key
    w_tie = Window.partitionBy(*key_cols, "valid_from").orderBy(F.desc("_src"))
    cand = (
        cand.withColumn("_tie", F.row_number().over(w_tie))
        .filter(F.col("_tie") == 1)
        .drop("_tie")
    )

    w = Window.partitionBy(*key_cols).orderBy("valid_from", "_src")
    prev_same = F.lag(F.struct(*tracked_cols)).over(w) == F.struct(*tracked_cols)
    kept = cand.withColumn(
        "_noop", (F.col("_src") == 1) & F.coalesce(prev_same, F.lit(False))
    ).filter(~F.col("_noop"))

    nxt = F.lead("valid_from").over(w)  # same spec as the no-op window
    return kept.select(
        *key_cols,
        *tracked_cols,
        "valid_from",
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


def scd2_merge(
    table,
    batch: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tracked_cols: list[str],
) -> None:
    """Apply a change batch to a materialized SCD2 dimension ``table``
    (ParquetTable or VersionedTable). Reads only to compute the affected
    keys' replacement rows, then merges on the composite
    ``(*key_cols, valid_from)`` key — the closed-out prior version
    updates in place (same valid_from, new valid_to) and new versions
    insert. Empty-table first load is a plain apply.

    Missing-table detection is an explicit ``table.exists()`` gate, NOT a
    try/except around ``read()``: a transient read error (corrupt log
    entry, FS hiccup, permissions) on an EXISTING dimension must raise,
    because treating it as "first load" would overwrite all history with
    only this batch's keys — irreversible loss, and this is the
    per-micro-batch path of ``scd2_dimension_stream``.

    **Late-arriving changes.** :func:`scd2_apply` enforces a monotone-
    batch contract (it reads only open rows). This writer detects the
    violating keys up front — one tiny aggregate join of batch-min-ts vs
    open ``valid_from`` — and routes ONLY those keys through a
    full-history rebuild: their versions are replayed as a change log
    together with the late batch rows (batch wins a (key, ts) tie, which
    is what makes at-least-once redelivery of an OLD batch a fixpoint),
    spliced intervals are merged back, and versions the splice obsoleted
    are deleted. The hot path is untouched: closed history is read only
    for keys that actually carry late data, so the common all-on-time
    batch still costs open-rows ⋈ batch. The merge lands before the
    stale-row delete, so a crash between the two commits leaves a
    transient duplicate-current anomaly (repaired by re-running the
    batch), never data loss."""
    if table.exists():
        current = table.read()
        if not current.columns:
            current = None
    else:
        current = None
    if current is None:
        table.overwrite(scd2_apply(None, batch, key_cols, ts_col, tracked_cols))
        return

    # MAX over the open rows, deliberately mirroring scd2_apply's monotone
    # assert (which also takes max): the two MUST agree on which side of
    # the late/on-time split a key falls. With min, the documented crash
    # window (merge landed, stale-row delete didn't) wedges replays
    # forever: the duplicate-current state has open rows at t and t2>t;
    # min routes the replayed batch (ts=t) to the ON-TIME path, whose
    # assert compares against max=t2 and raises — on every replay. With
    # max the anomalous key routes through the rebuild, which deletes the
    # stale row: re-running the batch is the repair, as documented.
    open_vf = (
        current.filter(F.col("is_current"))
        .groupBy(*key_cols)
        .agg(F.max("valid_from").alias("_ovf"))
    )
    late_keys = (
        batch.groupBy(*key_cols)
        .agg(F.min(ts_col).alias("_bmin"))
        .join(open_vf, list(key_cols))
        .filter(F.col("_bmin") < F.col("_ovf"))
        .select(*key_cols)
        .localCheckpoint(eager=True)
    )
    if late_keys.isEmpty():
        # materialized once: VersionedTable.merge_upsert consumes its
        # batch several times (bounds, key set, part write, CDC) and
        # would otherwise replay the 3-window apply plan each time
        out = scd2_apply(
            current, batch, key_cols, ts_col, tracked_cols
        ).localCheckpoint(eager=True)
        table.merge_upsert(out, keys=[*key_cols, "valid_from"])
        return

    on_time = batch.join(late_keys, list(key_cols), "left_anti")
    late_batch = batch.join(F.broadcast(late_keys), list(key_cols), "left_semi")
    hist = current.join(F.broadcast(late_keys), list(key_cols), "left_semi")
    # Replay the affected keys' full version log + late rows through the
    # pure apply; a (key, ts) collision resolves to the batch row.
    log = (
        hist.select(
            *key_cols,
            *tracked_cols,
            F.col("valid_from").alias(ts_col),
            F.lit(0).alias("_pri"),
        )
        .unionByName(
            late_batch.select(
                *key_cols, *tracked_cols, F.col(ts_col), F.lit(1).alias("_pri")
            )
        )
    )
    w_pri = Window.partitionBy(*key_cols, ts_col).orderBy(F.desc("_pri"))
    log = (
        log.withColumn("_rn", F.row_number().over(w_pri))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_pri")
    )
    rebuilt = scd2_apply(None, log, key_cols, ts_col, tracked_cols).localCheckpoint(
        eager=True
    )
    # versions the splice suppressed (e.g. a late row made its successor a
    # no-op) must go away, or the table keeps two current rows per key
    stale = (
        hist.select(*key_cols, "valid_from")
        .exceptAll(rebuilt.select(*key_cols, "valid_from"))
        .localCheckpoint(eager=True)
    )
    out = (
        scd2_apply(current, on_time, key_cols, ts_col, tracked_cols)
        .unionByName(rebuilt)
        .localCheckpoint(eager=True)
    )
    table.merge_upsert(out, keys=[*key_cols, "valid_from"])
    if not stale.isEmpty():
        table.delete_matching(stale, keys=[*key_cols, "valid_from"])
