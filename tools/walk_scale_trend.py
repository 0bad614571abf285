"""Distributed random-walk scale evidence (PERF.md, round 11).

x_random_walks_trade rides the 25-node nation graph's driver fast path;
this measures the DISTRIBUTED loop the property suite pins bit-identical
(``random_walks(driver_threshold=0)``) plus the downstream
``walk_skipgrams`` aggregation, on the same synthetic hub-skewed
generator as the round-9/10 graph checks (dst ~ rand³·n), local[32]:

- walk generation: rank+degree tables built once (checkpointed), then
  per step TWO fixed-width hash joins of the constant-size walker frame
  (nodes × num_walks rows) — adjacency arrays never shuffle; all
  walk_len+1 step checkpoints retained (they ARE the output).
- skip-gram pairs: ONE exchange groups trajectories (every key has
  identical cardinality — no skew possible), row-local pair fan-out,
  map-side-combinable count.

Deterministic: seeded random.Random, fixed sizes; the walks themselves
are hash-seeded (no RNG state). Usage:
    python tools/walk_scale_trend.py [--sizes 10000,100000,1000000]
Writes a markdown table to stdout; paste into PERF.md.
"""

from __future__ import annotations

import argparse
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_edges(spark, n_edges: int, seed: int = 90210):
    """Hub-skewed multigraph, the round-9 generator (weights unused)."""
    rng = random.Random(seed)
    n = max(2, n_edges // 5)
    rows = [
        (rng.randrange(n), int((rng.random() ** 3) * n))
        for _ in range(n_edges)
    ]
    return spark.createDataFrame(rows, "src long, dst long").repartition(32)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="10000,100000,1000000")
    ap.add_argument("--walk-len", type=int, default=4)
    ap.add_argument("--num-walks", type=int, default=2)
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    from bi_gcp_stitch_repl_spark.functions.graph import (
        random_walks,
        walk_skipgrams,
    )
    from bi_gcp_stitch_repl_spark.session import get_spark

    spark = get_spark(app_name="walk_scale_trend", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warm-up on the smallest size
    e = make_edges(spark, 1000)
    walk_skipgrams(
        random_walks(e, args.walk_len, args.num_walks, driver_threshold=0)
    ).count()

    print(
        "| edges | walkers | walk rows | walks dist"
        f" ({args.walk_len} steps × {args.num_walks}) | skipgrams w=2 |"
    )
    print("|---|---|---|---|---|")
    for n_edges in sizes:
        e = make_edges(spark, n_edges).localCheckpoint(eager=True)
        t0 = time.time()
        w = random_walks(
            e, args.walk_len, args.num_walks, driver_threshold=0
        ).localCheckpoint(eager=True)
        n_rows = w.count()
        t_walk = time.time() - t0
        walkers = n_rows // (args.walk_len + 1)
        t0 = time.time()
        walk_skipgrams(w, window=2).count()
        t_sg = time.time() - t0
        print(
            f"| {n_edges:,} | {walkers:,} | {n_rows:,} | {t_walk:.1f} s |"
            f" {t_sg:.1f} s |"
        )


if __name__ == "__main__":
    main()
