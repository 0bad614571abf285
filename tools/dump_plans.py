#!/usr/bin/env python
"""Dump `.explain("formatted")` for every catalog query into plans/<tag>/.

Plan-only (no execution): builds each query's DataFrame against
$SPARK_GRAFT_SF_DIR (default sf0.1 raw fixtures) and writes
plans/<tag>/<name>_<suffix>.txt. Used by the optimization rounds to
snapshot before/after plan shapes (Exchange count, join strategy,
PushedFilters/ReadSchema, Python eval nodes).

Usage: python tools/dump_plans.py <tag> <suffix> [name ...]
  e.g. python tools/dump_plans.py r11 before            # all queries
       python tools/dump_plans.py r11 after q1_pricing_summary
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bi_gcp_stitch_repl_spark.queries import catalog  # noqa: E402
from bi_gcp_stitch_repl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r11"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = set(sys.argv[3:])
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = catalog.queries()
    names = sorted(only) if only else sorted(qs)
    failed = []
    for name in names:
        try:
            df = qs[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            failed.append(name)
            print(f"PLAN FAILED {name}: {exc}", file=sys.stderr)
            continue
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"ok   {name}")
    print(f"TOTAL {len(names)} plans, {len(failed)} failures")
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
