"""Driver-style Spark-vs-DuckDB comparison: row count + sorted column names +
order-insensitive value multiset. Mirrors the verify harness's contract so a
green run here predicts a green CORRECTNESS_r{N}.json."""

from __future__ import annotations

import datetime
import math


def _norm(v):
    """Normalize a cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v  # exact float equality: the catalog is built for bit-parity
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, decimal_types):
        return float(v)
    return v


try:
    from decimal import Decimal

    decimal_types = (Decimal,)
except ImportError:  # pragma: no cover
    decimal_types = ()


#: spark dtype string -> DuckDB type name (schema-parity contract)
_TYPE_MAP = {
    "bigint": "BIGINT",
    "int": "INTEGER",
    "smallint": "SMALLINT",
    "double": "DOUBLE",
    "float": "FLOAT",
    "string": "VARCHAR",
    "boolean": "BOOLEAN",
    "date": "DATE",
    "timestamp": "TIMESTAMP",
    "timestamp_ntz": "TIMESTAMP",
}


def compare(spark_df, duck_rel, max_report: int = 5) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    s_cols = sorted(spark_df.columns)
    d_cols = sorted(duck_rel.columns)
    if [c.lower() for c in s_cols] != [c.lower() for c in d_cols]:
        problems.append(f"columns differ: spark={s_cols} duck={d_cols}")
        return problems

    # type parity (the driver compares schemas, not just names)
    s_types = dict(spark_df.dtypes)
    d_types = {c.lower(): str(t) for c, t in zip(duck_rel.columns, duck_rel.types)}
    for col, st in s_types.items():
        dt = d_types.get(col.lower())
        expect = _TYPE_MAP.get(st, st.upper())
        decimal_ok = st.startswith("decimal") and (dt or "").startswith("DECIMAL")
        if dt != expect and not decimal_ok:
            problems.append(f"type differs for {col}: spark={st} duck={dt}")

    from pyspark.sql import functions as F

    s_rows = spark_df.select(*[F.col(f"`{c}`") for c in s_cols]).collect()
    d_all = duck_rel.fetchall()
    d_index = {c.lower(): i for i, c in enumerate(duck_rel.columns)}
    d_order = [d_index[c.lower()] for c in s_cols]

    if len(s_rows) != len(d_all):
        problems.append(f"row count differs: spark={len(s_rows)} duck={len(d_all)}")

    s_set = sorted(
        (tuple(repr(_norm(v)) for v in row) for row in s_rows)
    )
    d_set = sorted(
        (tuple(repr(_norm(row[i])) for i in d_order) for row in d_all)
    )
    if s_set != d_set:
        sm = [r for r in s_set if r not in set(d_set)][:max_report]
        dm = [r for r in d_set if r not in set(s_set)][:max_report]
        problems.append(
            f"values differ ({len(sm)}+ spark-only / {len(dm)}+ duck-only shown)\n"
            f"  spark-only: {sm}\n  duck-only:  {dm}\n  cols: {s_cols}"
        )
    return problems
