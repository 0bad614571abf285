"""Skew-handling join utilities.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
default in `session.py`) handles sort-merge skew transparently; explicit
salting remains necessary when (a) the skewed side feeds a shuffled join
whose other side is too big to broadcast but small enough to replicate, or
(b) a groupBy key is pathologically hot. This module gives the engine an
explicit, tested form of the pattern.

Salting is correctness-neutral by construction: the skewed side scatters
each row to one of ``n_salts`` sub-keys, the other side is replicated to
ALL sub-keys, so every original match pair still meets exactly once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def salted_topk(
    df: DataFrame,
    partition_by: list,
    order_by: list,
    k: int,
    salt_on: str | Column,
    n_salts: int = 64,
    rank_name: str = "rk",
) -> DataFrame:
    """EXACT top-k rows per group, two-level: a salted pre-reduction
    window (top-k per (group, hash-salt) over ``n_salts`` lanes)
    collapses each group to ≤ n_salts·k candidate rows, then the exact
    global window ranks that bounded survivor set as ``rank_name``.

    Why: a bare row_number window funnels each group's ENTIRE row set
    into one unsplittable sort task (windows, unlike joins, get no AQE
    skew splitting) — at 100 TB a low-cardinality group key stalls a
    single reducer no matter the cluster size. Every true global top-k
    row is necessarily in its salt lane's local top-k, so the two-level
    result is exactly the single-window answer.

    ``salt_on`` must be a pure function of a UNIQUE tiebreaker that also
    appears in ``order_by`` (deterministic lanes + total order = exact,
    rerun-stable results — never ``rand()``, see ``salted_join``).
    ``order_by`` entries are Columns (e.g. ``F.col(c).desc()``) or names.
    """
    salt = F.pmod(
        F.xxhash64(F.col(salt_on) if isinstance(salt_on, str) else salt_on),
        F.lit(n_salts),
    )
    w_local = Window.partitionBy(*partition_by, "__tk_salt").orderBy(*order_by)
    survivors = (
        df.withColumn("__tk_salt", salt)
        .withColumn("__tk_lrk", F.row_number().over(w_local))
        .filter(F.col("__tk_lrk") <= k)
        .drop("__tk_salt", "__tk_lrk")
    )
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return survivors.withColumn(rank_name, F.row_number().over(w)).filter(
        F.col(rank_name) <= k
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join with a hot-keyed ``skewed`` side by splitting each key into
    ``n_salts`` sub-keys.

    ``skewed`` rows get a DETERMINISTIC content-derived salt — never
    ``rand()``: a non-deterministic expression feeding a shuffle is a
    correctness hazard under partial stage retries (a recomputed map
    task re-salts its rows differently, so reducers that already fetched
    the old output can double-join or drop rows). Hashing the whole row
    scatters a hot key's rows across salts as long as ANY non-key column
    varies; fully identical duplicate rows share a salt (they are
    indistinguishable anyway). ``other`` is exploded ×n_salts so every
    (key, salt) partner exists. Supports inner/left joins (the salt
    lives only on join plumbing columns and is dropped).

    Cost model: ``other`` is shuffled n_salts× larger — use when
    |other| × n_salts ≪ |skewed|'s hot-key concentration, and prefer a
    plain ``broadcast(other)`` whenever ``other`` fits in memory (salting
    is the middle ground between broadcast and AQE skew-split).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how}")
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(n_salts)
    ).cast("int")
    s = skewed.withColumn("__salt", salt)
    o = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = s.join(o, on=[*on, "__salt"], how=how)
    return out.drop("__salt")
