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
