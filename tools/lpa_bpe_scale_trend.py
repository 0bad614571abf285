"""Round-11 distributed-loop scale evidence for the round's new
operators (PERF.md) — the graph_scale_trend discipline applied to:

- ``label_propagation(driver_threshold=0)`` — 4 synchronous rounds:
  per round ONE hash join of the checkpointed symmetric edge list
  against the labeling + a map-side-combinable (node, label) mass sum +
  a struct-max argmax, on the same hub-skewed synthetic multigraphs as
  the r9/r10 graph checks.
- ``bpe_train(driver_threshold=0)`` — 6 merge rounds over synthetic
  Zipf-ish word-frequency tables (seeded random words over a 12-letter
  alphabet, length 2-10): per round a zip-explode + combinable pair-mass
  sum on the checkpointed vocabulary, a 1-row argmax, a row-local
  rebuild fold.

Deterministic: seeded random.Random, fixed sizes. Usage:
    python tools/lpa_bpe_scale_trend.py [--edge-sizes ...] [--vocab-sizes ...]
Writes a markdown table to stdout; paste into PERF.md.
"""

from __future__ import annotations

import argparse
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graph_scale_trend import make_edges  # noqa: E402  (same generator)


def make_vocab(spark, n_words: int, seed: int = 4242):
    rng = random.Random(seed)
    letters = "abcdefghijkl"
    rows = [
        (
            "".join(rng.choice(letters) for _ in range(rng.randrange(2, 11))),
            rng.randrange(1, 1000),
        )
        for _ in range(n_words)
    ]
    return spark.createDataFrame(rows, "word string, freq long").repartition(32)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edge-sizes", default="10000,100000,1000000")
    ap.add_argument("--vocab-sizes", default="10000,100000,1000000")
    args = ap.parse_args()

    from bi_gcp_stitch_repl_spark.functions.bpe import bpe_train
    from bi_gcp_stitch_repl_spark.functions.graph import label_propagation
    from bi_gcp_stitch_repl_spark.session import get_spark

    spark = get_spark(app_name="lpa_bpe_scale_trend", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    e, nd = make_edges(spark, 1000)
    label_propagation(e, nd, n_iter=4, driver_threshold=0).count()
    bpe_train(make_vocab(spark, 1000), 6, driver_threshold=0).count()

    print("| edges | nodes | lpa dist (4 iter) |")
    print("|---|---|---|")
    for n_edges in [int(s) for s in args.edge_sizes.split(",")]:
        e, nd = make_edges(spark, n_edges)
        e = e.localCheckpoint(eager=True)
        n = nd.count()
        t0 = time.time()
        label_propagation(e, nd, n_iter=4, driver_threshold=0).count()
        print(f"| {n_edges:,} | {n:,} | {time.time() - t0:.1f} s |")

    print()
    print("| vocab words | bpe dist (6 merges) |")
    print("|---|---|")
    for n_words in [int(s) for s in args.vocab_sizes.split(",")]:
        wf = make_vocab(spark, n_words).localCheckpoint(eager=True)
        t0 = time.time()
        bpe_train(wf, 6, driver_threshold=0).count()
        print(f"| {n_words:,} | {time.time() - t0:.1f} s |")


if __name__ == "__main__":
    main()
