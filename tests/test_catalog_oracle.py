"""Every catalog query with an oracle must match DuckDB exactly —
the local twin of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from bi_gcp_stitch_repl_spark.queries import catalog

from .conftest import SF_ORACLE
from .oracle_compare import compare

QUERIES = catalog.queries()
ORACLES = catalog.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    df = QUERIES[name](spark, SF_ORACLE)
    rel = duck.sql(ORACLES[name])
    problems = compare(df, rel)
    assert not problems, f"{name}:\n" + "\n".join(problems)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_ORACLE)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() > 0


def test_tables_is_thread_safe(spark):
    """A threaded loader (e.g. bench staging all tables at once) must not
    race the one-time worker-package shipment: concurrent first calls used
    to double-addPyFile the same archive name, which SparkContext rejects."""
    from concurrent.futures import ThreadPoolExecutor

    catalog._SHIPPED_APPS.clear()  # force re-shipment on every thread
    names = ["region", "nation", "customer", "supplier", "part"] * 2

    def load(name):
        (df,) = catalog.tables(spark, SF_ORACLE, name)
        return df.count()

    with ThreadPoolExecutor(max_workers=10) as pool:
        counts = list(pool.map(load, names))
    assert all(c > 0 for c in counts)
