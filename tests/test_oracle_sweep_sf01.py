"""Opt-in full oracle sweep at sf0.1 — the reproducible CI form of the
ad-hoc large-scale check (round-1 notes ran it by hand; this pins it).

Run with:

    SPARK_GRAFT_CPUS=32 python -m pytest -m sf01 -q tests/test_oracle_sweep_sf01.py

Deselected by default (pytest.ini ``addopts = -m "not sf01"``) because it
re-executes all ~80 catalog queries AND their DuckDB twins on the 10×
fixtures (~10-15 min on local[32]).
"""

from __future__ import annotations

import os

import pytest

from bi_gcp_stitch_repl_spark.queries import catalog

from .oracle_compare import compare

SF01 = os.environ.get("SPARK_GRAFT_SWEEP_SF", "/root/testdata/sf0.1")

QUERIES = catalog.queries()
ORACLES = catalog.oracle_sql()


@pytest.fixture(scope="module")
def duck01():
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF01}/{t}.parquet')"
        )
    return con


@pytest.mark.sf01
@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle_sf01(spark, duck01, name):
    df = QUERIES[name](spark, SF01)
    problems = compare(df, duck01.sql(ORACLES[name]))
    assert not problems, f"{name}:\n" + "\n".join(problems)
