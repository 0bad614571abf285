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
    else:
        cand = new_rows

    w = Window.partitionBy(*key_cols).orderBy("valid_from", "_src")
    prev_same = F.lag(F.struct(*tracked_cols)).over(w) == F.struct(*tracked_cols)
    kept = cand.withColumn(
        "_noop", (F.col("_src") == 1) & F.coalesce(prev_same, F.lit(False))
    ).filter(~F.col("_noop"))

    w2 = Window.partitionBy(*key_cols).orderBy("valid_from", "_src")
    nxt = F.lead("valid_from").over(w2)
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
    insert. Empty-table first load is a plain apply."""
    try:
        current = table.read()
    except Exception:
        current = None
    if current is not None and not current.columns:
        current = None
    out = scd2_apply(current, batch, key_cols, ts_col, tracked_cols)
    if current is None:
        table.overwrite(out)
    else:
        table.merge_upsert(out, keys=[*key_cols, "valid_from"])
