"""As-of (point-in-time) join.

The reference has no as-of join (SURVEY.md §2.4 notes theta/as-of joins
absent), but a replication platform that lands change-history tables
(K7-style, `dags/sql-queries/bexio_and_stripe/execute_bexio_and_stripe_sql_queries.py:45-57`)
immediately needs one to answer "what was the entity's state when X
happened" without a quadratic range join. This is the standard scalable
formulation:

    union(left, right) → one hash shuffle on the key → one ordered window
    pass → ``last(payload, ignorenulls)``

Cost is a single Exchange + sort per side-sized input — no row explosion,
no per-left-row probe, independent of how many right rows precede each
left row. That shape survives 100 TB; the per-key nested-loop a naive
``JOIN ... ON r.ts <= l.ts`` plans (BroadcastNestedLoop or a range
cross-product) does not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _tagged_union(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload: dict[str, str],
    left_tiebreak: str | None,
    right_tiebreak: str | None,
    side_left: int,
    side_right: int,
    keep_right_ts: bool = False,
) -> tuple[DataFrame, list[str]]:
    """Shared scaffold for both as-of variants: the tagged side union and
    its total ordering. The ordering places ``_tb`` BETWEEN the sides
    only when BOTH sides supplied a real tiebreak (a shared sequence
    domain); with a one-sided tiebreak the other side's ``lit(0)``
    default would otherwise compete against real values and silently
    flip equal-timestamp matches across the strict/side rule — so the
    one-sided (and no-tiebreak) ordering is (_t, _side, _tb): side
    decides ties, the tiebreak only makes the within-side pick
    deterministic."""
    ltb = F.col(left_tiebreak) if left_tiebreak else F.lit(0)
    rtb = F.col(right_tiebreak) if right_tiebreak else F.lit(0)
    left_part = left.select(
        *on,
        F.col(left_ts).alias("_t"),
        ltb.alias("_tb"),
        F.lit(side_left).alias("_side"),
        F.struct(*left.columns).alias("_row"),
    )
    pay = [F.col(src).alias(out) for out, src in payload.items()]
    if keep_right_ts:
        pay = [F.col(right_ts).alias("_rt")] + pay
    right_part = right.select(
        *on,
        F.col(right_ts).alias("_t"),
        rtb.alias("_tb"),
        F.lit(side_right).alias("_side"),
        F.struct(*pay).alias("_p"),
    )
    unioned = left_part.unionByName(right_part, allowMissingColumns=True)
    both_tb = left_tiebreak is not None and right_tiebreak is not None
    order = ["_t", "_tb", "_side"] if both_tb else ["_t", "_side", "_tb"]
    return unioned, order


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload: dict[str, str],
    left_tiebreak: str | None = None,
    right_tiebreak: str | None = None,
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach the most recent right row at-or-before it.

    With tiebreaks on BOTH sides (a shared sequence domain), a right row
    matches when its ``(ts, tiebreak)`` is ``<=`` (or ``<`` when
    ``strict``) the left row's, comparing lexicographically. With a
    tiebreak on ONE side (or none), equal timestamps resolve purely by
    the strict/side rule and the tiebreak only makes the within-side
    pick deterministic — a one-sided tiebreak competing against the
    other side's implicit constant would silently flip equal-ts matches.

    ``payload`` maps output column name → right column; the result is every
    left column plus the payload columns (NULL where no right row precedes).
    """
    side_left, side_right = (0, 1) if strict else (1, 0)
    unioned, order = _tagged_union(
        left, right, on, left_ts, right_ts, payload,
        left_tiebreak, right_tiebreak, side_left, side_right,
    )
    # With strict=True a right row that ties the left row sorts AFTER it
    # and falls outside the up-to-current-row frame; with strict=False it
    # sorts before and is picked up. `last(ignorenulls)` skips the left
    # rows' NULL payloads, so each left row sees exactly the latest
    # preceding right payload.
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn("_m", F.last("_p", ignorenulls=True).over(w))
    return matched.filter(F.col("_row").isNotNull()).select(
        "_row.*", *[F.col(f"_m.{out}").alias(out) for out in payload]
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload: dict[str, str],
    left_tiebreak: str | None = None,
    right_tiebreak: str | None = None,
    tolerance_sec: float | None = None,
) -> DataFrame:
    """For each left row, attach the right row CLOSEST in time (either
    direction), preferring the backward match on equal distance.

    Ordering is lexicographic on ``(ts, tiebreak)`` like :func:`asof_join`:
    a right row sorts to the backward side when its (ts, tiebreak) <= the
    left row's. ``tolerance_sec`` bounds |Δt| in seconds (epoch-double
    arithmetic — exact for microsecond timestamps, whose epoch-micros stay
    under 2^53); farther matches yield NULL payloads.

    Same scale shape as the backward join: ONE hash shuffle on the key,
    then two ordered window passes over the same partitioning (backward
    last-ignorenulls, forward first-ignorenulls — the second window
    re-sorts but never re-shuffles). No row explosion, no per-row probe.
    """
    unioned, order = _tagged_union(
        left, right, on, left_ts, right_ts, payload,
        left_tiebreak, right_tiebreak, side_left=1, side_right=0,
        keep_right_ts=True,
    )
    # ties: the right row sorts BEFORE the left row (side 0 < 1), so an
    # exact-tie match lands on the backward side with Δ=0 and wins
    # outright — the forward window never needs to see it.
    w_back = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    m = unioned.withColumn("_b", F.last("_p", ignorenulls=True).over(w_back))
    m = m.withColumn("_f", F.first("_p", ignorenulls=True).over(w_fwd))
    m = m.filter(F.col("_row").isNotNull())

    t = F.col("_t").cast("double")
    db = t - F.col("_b._rt").cast("double")
    df_ = F.col("_f._rt").cast("double") - t
    ok_b = F.col("_b").isNotNull() & (
        F.lit(True) if tolerance_sec is None else db <= F.lit(float(tolerance_sec))
    )
    ok_f = F.col("_f").isNotNull() & (
        F.lit(True) if tolerance_sec is None else df_ <= F.lit(float(tolerance_sec))
    )
    pick = (
        F.when(ok_b & (~ok_f | (db <= df_)), F.col("_b"))
        .when(ok_f, F.col("_f"))
        .otherwise(F.lit(None))
    )
    m = m.withColumn("_m", pick)
    return m.select(
        "_row.*", *[F.col(f"_m.{out}").alias(out) for out in payload]
    )
