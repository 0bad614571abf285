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


# ---------------------------------------------------------------------------
# Subquery-shaped plans: correlated / EXISTS / scalar / HAVING-IN.
#
# The BI layer above a warehouse engine generates these four subquery shapes
# constantly; each one below is written as the DECORRELATED DataFrame plan
# Spark executes well at 100 TB (window-min, semi join, aggregate-over-
# aggregate, agg-then-join), while the oracle SQL keeps the textbook
# correlated form — proving the rewrite is semantics-preserving.
# ---------------------------------------------------------------------------


@register(
    "q2_min_cost_supplier",
    oracle=f"""
WITH offers AS (
  SELECT l_partkey, l_suppkey,
         MIN(CAST(l_extendedprice AS DECIMAL(10,2))) AS best_price
  FROM lineitem GROUP BY 1, 2
)
SELECT p.p_name, s.s_name, n.n_name AS supp_nation,
       CAST(o.best_price AS DOUBLE) AS best_price
FROM offers o
JOIN part p ON o.l_partkey = p.p_partkey
JOIN supplier s ON o.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE p.p_type = 'LARGE'
  AND o.best_price = (SELECT MIN(o2.best_price) FROM offers o2
                      WHERE o2.l_partkey = o.l_partkey)
ORDER BY best_price, p.p_name, s.s_name LIMIT 100
""",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q2 shape (min-cost supplier per part; the testdata has no
    partsupp, so the offer book is lineitem's observed (part, supplier)
    price floor). The oracle keeps the CORRELATED scalar subquery; here
    it is decorrelated to a window min over the part key — one pass over
    the offer aggregate instead of a per-row rescan, the rewrite every
    optimizer (and this plan, explicitly) performs. Dimension joins
    broadcast; ties on the price floor all survive, so no arbitrary
    min_by pick and the result is deterministic."""
    from pyspark.sql import Window

    l, p, s, n = tables(spark, sf_dir, "lineitem", "part", "supplier", "nation")
    offers = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice").cast("decimal(10,2)")).alias("best_price")
    )
    floor = Window.partitionBy("l_partkey")
    best = offers.withColumn(
        "part_floor", F.min("best_price").over(floor)
    ).filter(F.col("best_price") == F.col("part_floor"))
    return (
        best.join(F.broadcast(p.filter(F.col("p_type") == "LARGE")),
                  best.l_partkey == p.p_partkey)
        .join(F.broadcast(s), best.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "p_name",
            "s_name",
            F.col("n_name").alias("supp_nation"),
            F.col("best_price").cast("double").alias("best_price"),
        )
        .orderBy("best_price", "p_name", "s_name")
        .limit(100)
    )


@register(
    "q4_order_priority",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-07-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY 1
""",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q4 shape: orders (in a half-year window) having at least one
    lineitem shipped >60 days after order date, counted by priority. The
    oracle's EXISTS becomes a LEFT SEMI join — hash on the orderkey both
    fact tables share, the date comparison staying a residual condition on
    the joined row (never an inequality join). Semi stops at first match,
    so the 1:N fan-out is never materialized."""
    o, l = tables(spark, sf_dir, "orders", "lineitem")
    o = o.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(l, on=late, how="left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q9_product_profit",
    oracle=f"""
SELECT n.n_name AS supp_nation,
       CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM({_REV_DUCK.replace("l_extendedprice", "l.l_extendedprice").replace("l_discount", "l.l_discount")}
                - CAST(p.p_retailprice AS DECIMAL(10,2))
                  * CAST(l.l_quantity AS DECIMAL(4,1))) AS DOUBLE) AS profit
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE p.p_name LIKE '%widget%'
GROUP BY 1, 2
""",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q9 shape: profit (revenue minus retail cost of goods) on
    widget parts by supplier nation and order year. Five-table tree with
    the same plan discipline as q7: part/supplier/nation broadcast (part
    pre-filtered by the LIKE before broadcast, so the hash table only
    holds widgets), lineitem⋈orders hashed on orderkey, one output
    shuffle. The profit term is exact decimal end-to-end."""
    l, o, p, s, n = tables(
        spark, sf_dir, "lineitem", "orders", "part", "supplier", "nation"
    )
    profit_term = _rev_spark() - F.col("p_retailprice").cast(
        "decimal(10,2)"
    ) * F.col("l_quantity").cast("decimal(4,1)")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(p.filter(F.col("p_name").like("%widget%"))),
            l.l_partkey == p.p_partkey,
        )
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("supp_nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(profit_term).cast("double").alias("profit"))
    )


@register(
    "q10_returned_items",
    oracle=f"""
SELECT c.c_custkey, c.c_name, n.n_name AS cust_nation,
       CAST(SUM({_REV_DUCK.replace("l_extendedprice", "l.l_extendedprice").replace("l_discount", "l.l_discount")}) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1998-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-07-01'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, c_custkey LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q10 shape: the 20 customers losing the most revenue to
    returned items in a half-year window. Returnflag filter pushes to the
    lineitem scan, the order-date filter to the orders scan — both facts
    shrink before the orderkey hash join. Top-20 runs as
    TakeOrderedAndProject (per-partition heaps), never a global sort;
    custkey tiebreak keeps it deterministic."""
    l, o, c, n = tables(spark, sf_dir, "lineitem", "orders", "customer", "nation")
    return (
        l.filter(F.col("l_returnflag") == "R")
        .join(
            o.filter(
                (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-07-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("cust_nation"))
        .agg(F.sum(_rev_spark()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q18_large_orders",
    oracle="""
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       CAST(q.sum_qty AS DOUBLE) AS sum_qty
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(12,1))) AS sum_qty
      FROM lineitem GROUP BY 1) q ON q.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                       GROUP BY 1 HAVING SUM(CAST(l_quantity AS DECIMAL(12,1))) > 250)
ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 100
""",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q18 shape: customers who placed very large orders (total
    quantity > 250). The oracle's HAVING + IN-subquery collapses to ONE
    aggregate reused as both the filter and the projected sum — lineitem
    is scanned and aggregated once, not twice as the literal SQL implies.
    The qualifying-order set (HAVING keeps ~top-1% of orders) then joins
    orders on the orderkey partitioning the aggregate already produced."""
    l, o, c = tables(spark, sf_dir, "lineitem", "orders", "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,1)")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("sum_qty").cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@register(
    "q11_revenue_concentration",
    oracle=f"""
WITH nat_rev AS (
  SELECT n.n_name AS supp_nation,
         SUM({_REV_DUCK.replace("l_extendedprice", "l.l_extendedprice").replace("l_discount", "l.l_discount")}) AS revenue
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  GROUP BY 1
)
SELECT supp_nation, CAST(revenue AS DOUBLE) AS revenue,
       CAST(revenue AS DOUBLE) / CAST((SELECT SUM(revenue) FROM nat_rev) AS DOUBLE) AS share
FROM nat_rev
WHERE CAST(revenue AS DOUBLE)
      > 0.04 * CAST((SELECT SUM(revenue) FROM nat_rev) AS DOUBLE)
""",
)
def q11_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q11 shape: supplier nations carrying more than 4% of global
    revenue. The oracle's scalar subquery (global total) is evaluated here
    as an unpartitioned window SUM over the 25-row per-nation aggregate —
    the fact table is scanned ONCE; the naive plan (recompute the total
    from lineitem inside the subquery) would scan it twice. A global
    window on a dimension-sized aggregate is fine at any scale; on a fact
    table it never would be. Decimal sums, one IEEE division at the end."""
    from pyspark.sql import Window

    l, s, n = tables(spark, sf_dir, "lineitem", "supplier", "nation")
    nat_rev = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("supp_nation"))
        .agg(F.sum(_rev_spark()).alias("revenue"))
    )
    total = F.sum("revenue").over(Window.partitionBy())
    return (
        nat_rev.withColumn("total", total.cast("double"))
        .filter(F.col("revenue").cast("double") > 0.04 * F.col("total"))
        .select(
            "supp_nation",
            F.col("revenue").cast("double").alias("revenue"),
            (F.col("revenue").cast("double") / F.col("total")).alias("share"),
        )
    )
