"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose the full operator catalog
(``bi_gcp_stitch_repl_spark.queries``) — every SURVEY.md §2 operator plus
the §7.6 LLM-pipeline extensions, each with a DuckDB oracle where the
semantics are SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from bi_gcp_stitch_repl_spark.queries import catalog as _catalog
from bi_gcp_stitch_repl_spark.session import tune_existing

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune_existing(spark)
    return _catalog.queries()["flagship_union_history"](spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §7.6."""
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return _catalog.oracle_sql()
