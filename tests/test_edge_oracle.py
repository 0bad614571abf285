"""Oracle parity on the edge rows the driver testdata excludes.

Real web corpora contain what the synthetic fixtures don't: vertical-tab
whitespace (``\\x0B`` — the exact Java-``\\s``-vs-RE2-``\\s`` divergence the
WS_CLASS sweep exists for), EMPTY documents (every ratio's divide-by-zero),
documents shorter than a gram (empty-gram fingerprint guards), ADJACENT
language markers ('le le le' — the replace-arithmetic undercount class),
and zero embedding vectors (norm/scale divisions). This module builds an
edge-augmented copy of the smoke fixture and re-runs EVERY oracled catalog
query that reads ``documents``/``embeddings`` against its DuckDB twin over
it — the same compare contract as the driver's CORRECTNESS gate, so a
dialect divergence OR an engine-specific /0 surprise on these rows fails
here before it can fail on real data.
"""

from __future__ import annotations

import shutil

import pytest

from bi_gcp_stitch_repl_spark.queries import catalog

from .conftest import SF_SMOKE
from .oracle_compare import compare

#: (doc_id, text, lang, source) — n_chars derived. Each row exists to
#: exercise one documented edge; keep the comments honest.
_EDGE_DOCS = [
    # \x0B between tokens: Java \s splits here, RE2 \s does NOT — any
    # leftover '\s' oracle site diverges on this row
    (9001, "alpha\x0bbeta the and of value und der", "en", "edge"),
    # empty document: every ratio's denominator is 0
    (9002, "", "en", "edge"),
    # shorter than the 5-char gram: empty-gram fingerprint guards
    (9003, "ab", "de", "edge"),
    # ADJACENT repeated markers: replace-arithmetic counting sees 2 of 3
    (9004, "le le le et et les et", "fr", "edge"),
    # leading/trailing/tab/newline whitespace: empty-token drops + \x0B mix
    (9005, " \t the\nand\x0bof value \n ", "en", "edge"),
    # whitespace-only document: tokenizes to ZERO tokens but n_chars > 0
    (9006, " \t\n\x0b\f\r ", "fr", "edge"),
]

#: zero vector: norm/scale denominators are 0 (cosine, quantize, JL ratio)
_EDGE_VEC_ID = 9001


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory, spark):
    import duckdb

    d = tmp_path_factory.mktemp("sf_edge")
    for t in (
        "region nation customer supplier part orders lineitem events".split()
    ):
        shutil.copy(f"{SF_SMOKE}/{t}.parquet", d / f"{t}.parquet")
    con = duckdb.connect()
    doc_rows = ", ".join(
        f"({i}, {_sql(text)}, {_sql(lang)}, {_sql(src)}, {len(text)})"
        for i, text, lang, src in _EDGE_DOCS
    )
    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('{SF_SMOKE}/documents.parquet')
          UNION ALL
          SELECT CAST(doc_id AS BIGINT), text, lang, source,
                 CAST(n_chars AS BIGINT)
          FROM (VALUES {doc_rows}) v(doc_id, text, lang, source, n_chars)
        ) TO '{d}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('{SF_SMOKE}/embeddings.parquet')
          UNION ALL
          SELECT CAST({_EDGE_VEC_ID} AS BIGINT),
                 CAST([0.0 for i in generate_series(1, 64)] AS FLOAT[]),
                 CAST(0 AS INTEGER)
        ) TO '{d}/embeddings.parquet' (FORMAT PARQUET)
        """
    )
    return str(d)


def _sql(s: str) -> str:
    body = s.replace("'", "''")
    # chr() splices keep the control chars out of the SQL text itself
    for ch in "\x0b\f\r\n\t":
        body = body.replace(ch, f"' || chr({ord(ch)}) || '")
    return f"'{body}'"


@pytest.fixture(scope="module")
def edge_duck(edge_dir):
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events"
        " documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS"
            f" SELECT * FROM read_parquet('{edge_dir}/{t}.parquet')"
        )
    return con


ORACLES = catalog.oracle_sql()
QUERIES = catalog.queries()
#: every oracled query whose SQL touches the edge-augmented tables —
#: membership is DERIVED so new text/embedding queries get edge coverage
#: automatically
EDGE_QUERIES = sorted(
    name
    for name, sql in ORACLES.items()
    if "documents" in sql or "embeddings" in sql
)


def test_edge_queries_selected():
    # the derivation must keep catching the core text/embedding family
    for must in (
        "x_lang_id", "x_quality_score", "x_text_stats", "x_winnowing_pairs",
        "x_embedding_quantize", "x_jl_project", "x_knn_cosine_topk",
        "x_html_extract", "x_minhash_lsh_candidates",
    ):
        assert must in EDGE_QUERIES


@pytest.mark.parametrize("name", EDGE_QUERIES)
def test_edge_query_matches_oracle(spark, edge_duck, edge_dir, name):
    df = QUERIES[name](spark, edge_dir)
    rel = edge_duck.sql(ORACLES[name])
    problems = compare(df, rel)
    assert not problems, f"{name}:\n" + "\n".join(problems)
