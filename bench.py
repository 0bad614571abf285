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
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bi_gcp_stitch_repl_spark.queries import catalog  # noqa: E402
from bi_gcp_stitch_repl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

#: The shuffle/join/agg-heavy queries that dominate a 100 TB deployment,
#: plus the LLM-pipeline extensions — the workload worth measuring.
HEADLINE = [
    "flagship_union_history",
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_local_supplier_volume",
    "a3_conditional_rollup",
    "w_topk_per_group",
    "st_session_windows",
    "x_dedup_exact",
    "x_minhash_lsh_candidates",
    "x_knn_cosine_topk",
    "x_text_stats",
]


def run_query(spark, name: str, queries) -> float:
    t0 = time.time()
    queries[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    spark = get_spark(app_name="bench", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    queries = catalog.queries()

    # Warm-up: JVM JIT + codegen + parquet footer caches on a tiny slice.
    for name in HEADLINE:
        try:
            queries[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass

    timings: dict[str, float] = {}
    for name in HEADLINE:
        timings[name] = round(run_query(spark, name, queries), 3)

    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1).rstrip(".")) if m else None
    out = {
        "metric": "headline_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
