"""Round-10 distributed graph-loop scale evidence (PERF.md).

The catalog's graph queries ride tiny aggregates (25-node nation graphs)
— driver fast paths and single-digit peel/frontier rounds. This measures
the DISTRIBUTED loops the property suites pin bit-identical, on the same
synthetic hub-skewed graphs as the round-9 pagerank/triangle check
(dst ~ rand³·n: heavy hubs), local[32]:

- ``hits_fixedpoint(driver_threshold=0)`` — 4 mutual-reinforcement
  rounds: 2 hash joins + 2 map-side sums per round on the checkpointed
  in-universe edge frame, normalization totals as 1-row broadcasts.
- ``k_core(k=3)`` — round-based peel with the r10 single-action fixpoint
  and superseded-checkpoint release.
- ``bfs_hops`` from one hub seed — frontier rounds whose cost tracks the
  boundary, not the graph.

Deterministic: seeded random.Random, fixed sizes. Usage:
    python tools/graph_scale_trend.py [--sizes 10000,100000,1000000]
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
    """Hub-skewed multigraph: n_nodes = n_edges/5, dst ~ rand³·n (heavy
    hubs), weights 1-3 — the round-9 generator."""
    rng = random.Random(seed)
    n = max(2, n_edges // 5)
    rows = [
        (
            rng.randrange(n),
            int((rng.random() ** 3) * n),
            rng.randrange(1, 4),
        )
        for _ in range(n_edges)
    ]
    e = spark.createDataFrame(rows, "src long, dst long, w long")
    nd = spark.range(n).selectExpr("id AS node")
    return e.repartition(32), nd


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="10000,100000,1000000")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    from bi_gcp_stitch_repl_spark.functions.graph import (
        bfs_hops,
        hits_fixedpoint,
        k_core,
    )
    from bi_gcp_stitch_repl_spark.session import get_spark

    spark = get_spark(app_name="graph_scale_trend", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warm-up on the smallest size
    e, nd = make_edges(spark, 1000)
    hits_fixedpoint(e, nd, driver_threshold=0).count()
    k_core(e.select("src", "dst"), 3).count()
    bfs_hops(e, nd.limit(1)).count()

    print("| edges | nodes | hits dist (4 iter) | k_core k=3 | bfs_hops |")
    print("|---|---|---|---|---|")
    for n_edges in sizes:
        e, nd = make_edges(spark, n_edges)
        e = e.localCheckpoint(eager=True)  # exclude generation cost
        n = nd.count()
        t0 = time.time()
        hits_fixedpoint(e, nd, driver_threshold=0).count()
        t_hits = time.time() - t0
        t0 = time.time()
        k_core(e.select("src", "dst"), 3).count()
        t_core = time.time() - t0
        seeds = nd.orderBy("node").limit(1)
        t0 = time.time()
        bfs_hops(e, seeds).count()
        t_bfs = time.time() - t0
        print(
            f"| {n_edges:,} | {n:,} | {t_hits:.1f} s | {t_core:.1f} s |"
            f" {t_bfs:.1f} s |"
        )


if __name__ == "__main__":
    main()
