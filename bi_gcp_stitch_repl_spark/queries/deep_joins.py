"""Deep join-tree analytics: TPC-H q7/q8-shaped plans over the testdata
star schema.

The reference's heaviest SQL is a 3-CTE join (SURVEY.md §2.4 J2); a
warehouse engine additionally has to execute 5-7-table join trees well,
because that is what the BI layer above it generates. These two queries
pin the plan shape the engine wants at 100 TB:

* every dimension chain (nation→supplier, nation→customer, region)
  broadcasts — the fact table is the only shuffled input;
* the fact-fact join (lineitem ⋈ orders) hashes on the orderkey both
  sides already share;
* market share is sum-of-flagged / sum-of-all in ONE aggregation pass —
  never two scans joined back together.

Determinism: revenue is computed IN decimal from the raw 2-decimal
columns (price × (1 − discount) as exact decimal arithmetic — casting
the computed double product to decimal instead rounds differently per
engine in rare half-way cases; caught at sf0.1) and the share ratio is
one final IEEE division of the decimal sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import register, tables

#: exact decimal revenue term: price and discount cast from their RAW
#: 2-decimal doubles, all arithmetic in decimal (q1's pattern — rule 1)
_REV_DUCK = (
    "CAST(l_extendedprice AS DECIMAL(10,2))"
    " * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))"
)


def _rev_spark() -> "F.Column":
    return F.col("l_extendedprice").cast("decimal(10,2)") * (
        F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(4,2)")
    )


@register(
    "q7_volume_shipping",
    oracle=f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM({_REV_DUCK.replace("l_extendedprice", "l.l_extendedprice").replace("l_discount", "l.l_discount")}) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE n1.n_regionkey <> n2.n_regionkey
GROUP BY 1, 2, 3
""",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-region trade volume: revenue between (supplier nation, customer
    nation) pairs in different regions, by order year. Six-table tree:
    nation×2/supplier/customer broadcast, lineitem⋈orders hash on orderkey,
    one groupBy shuffle on the (nation, nation, year) output key. The
    inequality region predicate is a residual filter on broadcast columns —
    free, never a join explosion."""
    l, o, s, c, n = tables(
        spark, sf_dir, "lineitem", "orders", "supplier", "customer", "nation"
    )
    n1 = n.select(
        F.col("n_nationkey").alias("s_nk"),
        F.col("n_name").alias("supp_nation"),
        F.col("n_regionkey").alias("s_rk"),
    )
    n2 = n.select(
        F.col("n_nationkey").alias("c_nk"),
        F.col("n_name").alias("cust_nation"),
        F.col("n_regionkey").alias("c_rk"),
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(F.col("s_rk") != F.col("c_rk"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(_rev_spark()).cast("double").alias("revenue"))
    )


TARGET_NATION = "NATION_7"  # the "market share of" subject
TARGET_REGION = 2  # its region key: share measured within this market


@register(
    "q8_market_share",
    oracle=f"""
WITH flows AS (
  SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
         {_REV_DUCK.replace("l_extendedprice", "l.l_extendedprice").replace("l_discount", "l.l_discount")} AS volume,
         n1.n_name AS supp_nation
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN part p ON l.l_partkey = p.p_partkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  WHERE n2.n_regionkey = {TARGET_REGION} AND p.p_type = 'PROMO'
)
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = '{TARGET_NATION}' THEN volume
                     ELSE CAST(0 AS DECIMAL(14,4)) END) AS DOUBLE)
         / CAST(SUM(volume) AS DOUBLE) AS mkt_share
FROM flows GROUP BY o_year
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share: {TARGET_NATION}'s fraction of PROMO-part
    revenue sold into region {TARGET_REGION}, per year. Seven-table tree;
    the share is a conditional sum over the SAME aggregation pass as the
    denominator (one scan, one shuffle on year) — the two-scan
    self-join formulation doubles fact I/O for nothing. Both sums are
    decimal-exact; the ratio is one IEEE division at the very end."""
    l, o, p, s, c, n = tables(
        spark, sf_dir, "lineitem", "orders", "part", "supplier", "customer", "nation"
    )
    n1 = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk"))
    flows = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p.filter(F.col("p_type") == "PROMO")), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(
            F.broadcast(n2.filter(F.col("c_rk") == TARGET_REGION)),
            F.col("c_nationkey") == F.col("c_nk"),
        )
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            _rev_spark().alias("volume"),
            "supp_nation",
        )
    )
    target_vol = F.when(
        F.col("supp_nation") == TARGET_NATION, F.col("volume")
    ).otherwise(F.lit(0).cast("decimal(14,4)"))
    return flows.groupBy("o_year").agg(
        (
            F.sum(target_vol).cast("double") / F.sum("volume").cast("double")
        ).alias("mkt_share")
    )
