"""Upsert-key carry-forward (SURVEY.md J1): preserve surrogate keys and
created_at audit columns across refreshes.

The reference loops ``iterrows`` doing a per-row ``.loc`` lookup against the
existing table to reuse ``u_id``/``created_at`` when the business key already
exists, else mints ``uuid4()`` / ``now()``
(``dags/bexio/bexio_invoice_and_line_items_de.py:155-162,262-270``,
``dags/bexio/bexio_orders_de.py:137-144``). That is a LEFT OUTER equi-join +
``coalesce`` — here expressed exactly so, with the existing-keys side
broadcast when small.

Determinism note (SURVEY §7.5): ``uuid()``/``current_timestamp()`` are
nondeterministic, which breaks hash-based oracles and breaks re-run
idempotency (two runs mint different keys for the same new row). Both
defaults are therefore injectable: tests pass a deterministic minting
expression derived from the business key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def carry_forward_keys(
    batch: DataFrame,
    existing: DataFrame,
    business_key: str,
    carried: dict[str, Column],
    broadcast_existing: bool = True,
) -> DataFrame:
    """LEFT JOIN ``existing`` on ``business_key``; for each carried column,
    keep the existing value when present else the provided default expression.

    ``carried`` maps column name -> default Column minted for brand-new keys
    (e.g. ``{"u_id": F.expr("uuid()"), "created_at": F.current_timestamp()}``
    in production; deterministic expressions in tests).
    """
    lookup = existing.select(business_key, *carried.keys())
    # ONE row per business key, picked deterministically (min carried
    # struct): a duplicate-keyed existing table — easy after a crashed
    # append — would otherwise fan every matching batch row out N ways
    # through the left join, silently duplicating rows into the upsert
    lookup = (
        lookup.groupBy(business_key)
        .agg(F.min(F.struct(*carried.keys())).alias("_c"))
        .select(business_key, *[F.col(f"_c.{c}").alias(c) for c in carried])
    )
    if broadcast_existing:
        lookup = F.broadcast(lookup)
    # Suffix existing-side columns to avoid ambiguity with batch columns.
    renamed = lookup.select(
        F.col(business_key),
        *[F.col(c).alias(f"__existing_{c}") for c in carried],
    )
    joined = batch.join(renamed, on=business_key, how="left")
    out = joined
    for c, default in carried.items():
        out = out.withColumn(c, F.coalesce(F.col(f"__existing_{c}"), default))
    return out.drop(*[f"__existing_{c}" for c in carried])
