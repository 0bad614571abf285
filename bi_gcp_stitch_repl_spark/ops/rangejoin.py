"""Banded range join (proximity join on a numeric/time axis).

Absent from the reference (SURVEY.md §2.4: no theta/range joins), but a
required primitive once event tables exist: "rows within ±t of each
other" written naively is a cross join with an inequality predicate,
which Spark plans as BroadcastNestedLoopJoin — O(|L|·|R|) comparisons
regardless of how sparse the matches are, a non-starter at 100 TB.

The banded form turns it into an equi-join: bucket both sides by
``floor(key / tolerance)``; any pair within ``tolerance`` differs by at
most one bucket, so each left row probes exactly three buckets (b-1, b,
b+1) and the residual ``abs(l-r) <= tolerance`` filter runs only on
bucket-collision pairs. One shuffle on the bucket id, output bounded by
true matches + near-misses inside adjacent buckets — the standard
interval-join strategy (same trick Flink/Trino interval joins use).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def band_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    tolerance: int,
) -> DataFrame:
    """All (left × right) pairs with ``|left_key - right_key| <= tolerance``.

    Keys must be non-negative numerics (epoch micros, positions, ...);
    column names of the two sides must be disjoint. Each matching pair is
    produced exactly once (a right row lives in one bucket, and a left row
    emits each of its three candidate buckets once), so no distinct pass
    is needed.
    """
    if tolerance <= 0:
        # floor(x/0) is NULL in non-ANSI mode (silent EMPTY result) and a
        # DIVIDE_BY_ZERO abort under ANSI — neither is "exact match"
        raise ValueError(f"band_join tolerance must be > 0, got {tolerance}")
    for side, name in ((left, "left"), (right, "right")):
        if "_b" in side.columns:
            raise ValueError(
                f"band_join reserves column '_b'; {name} side already has it"
            )
    tol = F.lit(tolerance)
    lb = F.floor(F.col(left_key) / tol).cast("long")
    exploded = left.withColumn(
        "_b", F.explode(F.array(lb - 1, lb, lb + 1))
    )
    bucketed_right = right.withColumn(
        "_b", F.floor(F.col(right_key) / tol).cast("long")
    )
    return (
        exploded.join(bucketed_right, "_b")
        .filter(F.abs(F.col(left_key) - F.col(right_key)) <= tol)
        .drop("_b")
    )
