"""Query catalog: every engine operator as a named, oracle-checked query.

Each entry pairs
- a Spark callable ``(spark, sf_dir) -> DataFrame`` (idiomatic DataFrame API,
  exercising the engine modules), and
- an equivalent ANSI-SQL string DuckDB runs on the same parquet tables.

The driver hash-compares the two at sf=0.01 (row count + sorted column names
+ order-insensitive value hash), so determinism rules apply everywhere:

* **Money/metric aggregation** goes through DECIMAL: ``sum(cast(x as
  decimal(28,10)))`` is exact, hence independent of Spark's partition
  summation order, and matches DuckDB bit-for-bit once cast back to double
  (verified empirically on this data). Raw double ``sum()`` is
  order-dependent and would flake under AQE re-planning.
* **Vector math** uses Spark's ``aggregate``/``zip_with`` sequential fold,
  which matches DuckDB's ``list_sum(list_transform(list_zip(...)))``
  element order exactly (verified).
* **Top-k and limits** always carry a unique tiebreaker key in the ORDER BY.
* **No nondeterministic functions** (uuid, current_timestamp, first without
  order) anywhere in the catalog surface; carried-key defaults are
  deterministic expressions of the business key.
* ``events.ts`` has shipped as both TIMESTAMP(NANOS) and TIMESTAMP(MICROS)
  parquet across driver testdata generations. Spark refuses nanos by
  default: for that layout the loader flips
  ``spark.sql.legacy.parquet.nanosAsLong`` and rebuilds a microsecond
  timestamp with ``timestamp_micros(ts div 1000)`` — exactly DuckDB's
  read-time nanos→micros truncation. For micros parquet the column is
  already a (NTZ) timestamp and is used as-is. The loader sniffs the
  physical type from the footer instead of assuming either.
"""

from __future__ import annotations

import os
import tempfile
import zipfile
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class QueryDef:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


_REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator adding a (spark, sf_dir) -> DataFrame callable to the
    catalog, with its DuckDB oracle SQL (None → rows-only check)."""

    def wrap(fn):
        _REGISTRY[name] = QueryDef(fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


_SHIPPED_APPS: set[str] = set()


def _ensure_importable_on_workers(spark: SparkSession) -> None:
    """Python workers do NOT inherit the driver's ``sys.path`` — they only
    see the repo when the daemon happens to start with cwd = repo root. An
    external driver importing ``__spark_entry__`` from elsewhere would have
    every ``mapInPandas``/``applyInPandas`` task die with
    ModuleNotFoundError. Ship the package once per SparkContext as a zip
    via ``addPyFile`` — the same mechanism as ``spark-submit --py-files``,
    and exactly how the job would deploy to a real multi-node cluster
    (executors there share no filesystem with the driver at all)."""
    app = spark.sparkContext.applicationId
    if app in _SHIPPED_APPS:
        return
    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg_name = os.path.basename(pkg_dir)
    zip_path = os.path.join(
        tempfile.mkdtemp(prefix="spark_pkg_"), f"{pkg_name}.zip"
    )
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for fname in files:
                if not fname.endswith(".py"):
                    continue
                full = os.path.join(root, fname)
                arc = os.path.join(pkg_name, os.path.relpath(full, pkg_dir))
                zf.write(full, arc)
    spark.sparkContext.addPyFile(zip_path)
    _SHIPPED_APPS.add(app)


def _events_ts_is_nanos(path: str) -> bool:
    """Sniff the parquet footer for ``ts``'s physical unit (module docstring:
    the driver has shipped both nanos and micros across generations)."""
    import pyarrow.parquet as pq

    pfile = path
    if os.path.isdir(path):
        frags = [
            os.path.join(path, f)
            for f in sorted(os.listdir(path))
            if f.endswith(".parquet")
        ]
        if not frags:
            return False
        pfile = frags[0]
    field = pq.read_schema(pfile).field("ts")
    return getattr(field.type, "unit", None) == "ns"


def tables(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    """Load the named testdata tables; ``events`` gets the nanos fix-up
    when (and only when) the file actually carries nanos."""
    _ensure_importable_on_workers(spark)
    out = []
    for name in names:
        if name == "events" and _events_ts_is_nanos(f"{sf_dir}/events.parquet"):
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
                "ts", F.expr("timestamp_micros(ts div 1000)")
            )
        else:
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        out.append(df)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {name: qd.fn for name, qd in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {name: qd.oracle for name, qd in _REGISTRY.items() if qd.oracle is not None}


_LOADED = False


def _load_all() -> None:
    """Import the query modules exactly once (they self-register)."""
    global _LOADED
    if _LOADED:
        return
    from . import (  # noqa: F401
        behavior,
        curation,
        deep_joins,
        extensions,
        parity,
        relational_ext,
        windows,
    )

    _LOADED = True
