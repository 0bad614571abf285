"""Custom distributed sketches (the ones Spark does not ship built in).

Spark covers approximate distinct (HyperLogLog++) and quantiles
(approx_percentile); the missing classic is approximate FREQUENT ITEMS
over key spaces too large to hash-aggregate exactly. This module adds
Misra-Gries as an Arrow-batched mapInPandas operator:

- each input partition maintains one k-counter Misra-Gries summary —
  O(k) memory per task regardless of partition size or distinct count;
- partial summaries (item, count) rows are then summed per item — the
  only shuffle moves ≤ k rows per partition, never the raw stream;
- summing per-partition MG counters preserves the guarantee: each
  partition underestimates an item by at most n_p/(k+1), so the merged
  estimate underestimates by at most Σ n_p/(k+1) = n/(k+1)
  (Misra & Gries 1982; merge bound per Agarwal et al., "Mergeable
  Summaries", PODS 2012 — both public).

Contract (what tests pin): estimate ≤ true count, and
true − estimate ≤ n/(k+1). Every item with true count > n/(k+1) is
guaranteed present in the merged summary. The ESTIMATES depend on
partitioning/stream order (inherent to MG); the guarantees do not —
mirror of the x_approx_distinct / x_approx_quantiles audit pattern.

This is deliberately a library operator, not a catalog query: the
catalog's no-Python-eval plan lint is absolute, and MG's value is the
Arrow-batched custom-sketch path itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_partial_sketch(items, k: int, counters: dict | None = None) -> dict:
    """Plain-Python Misra-Gries over an iterable: ≤ k counters. Pass an
    existing ``counters`` dict to fold several streams into one sketch —
    the distributed path feeds each Arrow batch through the SAME
    unit-tested loop instead of maintaining a byte-for-byte copy that
    could silently drift."""
    if counters is None:
        counters = {}
    for it in items:
        if it in counters:
            counters[it] += 1
        elif len(counters) < k:
            counters[it] = 1
        else:
            # decrement-all step; drop zeroed counters
            dead = []
            for key in counters:
                counters[key] -= 1
                if counters[key] == 0:
                    dead.append(key)
            for key in dead:
                del counters[key]
    return counters


def mg_frequent_items(df: DataFrame, col: str, k: int = 64) -> DataFrame:
    """Approximate frequent items of ``df[col]`` with k-counter
    Misra-Gries per partition + per-item sum merge.

    Returns (item, est) where est ≤ true count and
    true − est ≤ n/(k+1). Nulls are ignored (not a frequent-item
    candidate). The result has at most k × n_partitions rows before the
    final filter; callers typically keep items with
    ``est > n/(k+1)`` — the set guaranteed to include every true heavy
    hitter above that threshold.
    """
    import pandas as pd

    def partial(batches):
        counters: dict = {}
        for pdf in batches:
            mg_partial_sketch(pdf[col].dropna(), k, counters)
        yield pd.DataFrame(
            {"item": list(counters.keys()), "est": list(counters.values())}
        )

    item_type = dict(df.dtypes)[col]
    # drop nulls JVM-side: a bigint batch containing a null converts to
    # float64 in Arrow->pandas, silently rounding ids above 2^53 so
    # distinct items collapse before counting
    partials = (
        df.select(F.col(col).alias(col))
        .filter(F.col(col).isNotNull())
        .mapInPandas(partial, schema=f"item {item_type}, est long")
    )
    return partials.groupBy("item").agg(F.sum("est").alias("est"))
