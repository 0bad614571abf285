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


def _rev_duck(alias: str = "") -> str:
    """The decimal revenue term with both lineitem columns qualified by
    ``alias`` — replaces the copy-pasted ``.replace(...).replace(...)``
    chains at every multi-table oracle site."""
    if not alias:
        return _REV_DUCK
    return _REV_DUCK.replace(
        "l_extendedprice", f"{alias}.l_extendedprice"
    ).replace("l_discount", f"{alias}.l_discount")


def _rev_spark() -> "F.Column":
    return F.col("l_extendedprice").cast("decimal(10,2)") * (
        F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(4,2)")
    )


@register(
    "q7_volume_shipping",
    oracle=f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM({_rev_duck("l")}) AS DOUBLE) AS revenue
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
    nation) pairs in different regions, by order year. Six-table tree.
    Force-broadcast hints go ONLY on nation×2 (25 rows at ANY scale);
    supplier and customer scale with SF — AQE broadcasts them while they
    fit the threshold (the local plan) and degrades to shuffle joins at
    100 TB, whereas a forced hint would abort the job at the broadcast
    limit. lineitem⋈orders hash on orderkey, customer on custkey, one
    groupBy shuffle on the (nation, nation, year) output key. The
    inequality region predicate is a residual filter on broadcast
    columns — free, never a join explosion."""
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
        .join(s, l.l_suppkey == s.s_suppkey)
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
         {_rev_duck("l")} AS volume,
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
    """National market share (TARGET_NATION='NATION_7''s fraction of
    PROMO-part revenue sold into region key TARGET_REGION=2, per year).
    Seven-table tree; the share is a conditional sum over the SAME
    aggregation pass as the denominator (one scan, one shuffle on year)
    — the two-scan self-join formulation doubles fact I/O for nothing.
    Force-broadcast hints only on the bounded nation slices; the
    filtered part and supplier sides scale with SF, so they are left to
    AQE (broadcast while small, shuffle at 100 TB — a forced hint would
    abort at the broadcast limit). Both sums are decimal-exact; the
    ratio is one IEEE division at the very end."""
    l, o, p, s, c, n = tables(
        spark, sf_dir, "lineitem", "orders", "part", "supplier", "customer", "nation"
    )
    n1 = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk"))
    flows = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(p.filter(F.col("p_type") == "PROMO"), l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
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
ORDER BY best_price, p.p_name, s.s_name, o.l_partkey, o.l_suppkey LIMIT 100
""",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q2 shape (min-cost supplier per part; the testdata has no
    partsupp, so the offer book is lineitem's observed (part, supplier)
    price floor). The oracle keeps the CORRELATED scalar subquery; here
    it is decorrelated to a window min over the part key — one pass over
    the offer aggregate instead of a per-row rescan, the rewrite every
    optimizer (and this plan, explicitly) performs. The p_type='LARGE'
    restriction is PUSHED BELOW the offer aggregation as a semi-join on
    the LARGE-part keys (AQE-broadcast while small; part scales with SF,
    so no forced hint — the q7/q8 rule): the window partitions by
    l_partkey and p_type is a per-part attribute, so filtering first is
    result-identical while both fact-sized shuffles (the groupBy and
    the window) shrink by the type's selectivity — aggregating the full
    offer book only to discard non-LARGE parts afterwards wastes both.
    Only fixed-size nation keeps a broadcast hint; ties on the price
    floor all survive with a (partkey, suppkey) total tiebreaker, so
    no arbitrary min_by pick and the result is deterministic."""
    from pyspark.sql import Window

    l, p, s, n = tables(spark, sf_dir, "lineitem", "part", "supplier", "nation")
    large_parts = p.filter(F.col("p_type") == "LARGE")
    # part/supplier sides scale with SF — no forced broadcast hint (the
    # q7/q8 discipline: a hint on a growing side bypasses the size check
    # and aborts at the broadcast limit at 100 TB; AQE still broadcasts
    # them while they actually fit). Only fixed-size nation keeps a hint.
    offers = (
        l.join(
            large_parts.select("p_partkey"),
            l.l_partkey == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(F.col("l_extendedprice").cast("decimal(10,2)")).alias(
                "best_price"
            )
        )
    )
    floor = Window.partitionBy("l_partkey")
    best = offers.withColumn(
        "part_floor", F.min("best_price").over(floor)
    ).filter(F.col("best_price") == F.col("part_floor"))
    return (
        best.join(large_parts, best.l_partkey == p.p_partkey)
        .join(s, best.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "p_name",
            "s_name",
            F.col("n_name").alias("supp_nation"),
            F.col("best_price").cast("double").alias("best_price"),
            # carried ONLY as tiebreakers: (best_price, p_name, s_name)
            # is not a total order — p_name/s_name are non-unique, so a
            # duplicate triple straddling rank 100 would make the LIMIT
            # pick engine-dependent rows (catalog unique-tiebreaker rule)
            "l_partkey",
            "l_suppkey",
        )
        .orderBy("best_price", "p_name", "s_name", "l_partkey", "l_suppkey")
        .limit(100)
        .drop("l_partkey", "l_suppkey")
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
       CAST(SUM({_rev_duck("l")}
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
            # widget-filtered, but still ∝ SF — unhinted (q7/q8 rule)
            p.filter(F.col("p_name").like("%widget%")),
            l.l_partkey == p.p_partkey,
        )
        .join(s, l.l_suppkey == s.s_suppkey)
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
       CAST(SUM({_rev_duck("l")}) AS DOUBLE) AS revenue
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
         SUM({_rev_duck("l")}) AS revenue
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
        l.join(s, l.l_suppkey == s.s_suppkey)  # supplier ∝ SF: unhinted
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


# ---------------------------------------------------------------------------
# The rest of the classic decision-support suite, adapted to this star
# schema (no partsupp / shipmode / phone columns — each query notes its
# substitution). Together with q1-q5/q7-q11/q18 above, every TPC-H plan
# shape the BI layer generates is now covered: disjunctive predicate
# pushdown (q19), double-aggregation distributions (q13), anti-join
# NOT-IN/NOT-EXISTS (q16, q21, q22), and scalar-subquery thresholds
# evaluated once (q15, q17, q22).
# ---------------------------------------------------------------------------


@register(
    "q6_forecast_revenue",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2))
              * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q6: revenue change from hypothetically eliminating mid-band
    discounts on small-quantity lines in one year. Pure scan-side query —
    all three predicates push into the parquet scan and only two columns
    survive pruning; the aggregation is a map-side partial + 1-row final.
    The plan floor every other query builds on."""
    (l,) = tables(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(10,2)")
                * F.col("l_discount").cast("decimal(4,2)")
            )
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "q12_linestatus_priority",
    oracle="""
SELECT l.l_linestatus,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1
""",
)
def q12_linestatus_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q12 shape (testdata has no l_shipmode; l_linestatus plays the
    grouping role): lines shipped in 1997 split into urgent/other order
    priorities per line status. The shipdate filter shrinks lineitem at the
    scan before the orderkey hash join; both flag counts come from the SAME
    pass (one scan, one join, one 2-row aggregate)."""
    l, o = tables(spark, sf_dir, "lineitem", "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@register(
    "q13_order_distribution",
    oracle="""
WITH per_cust AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY 1
)
SELECT c_count, COUNT(*) AS custdist
FROM per_cust GROUP BY 1
""",
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q13: how many customers placed 0, 1, 2, ... orders. LEFT outer
    join keeps the zero-order customers (COUNT of the null-extended key is
    0, not 1), then a second aggregation over the customer-sized result
    builds the distribution. The first join+agg shuffles on custkey; the
    second shuffle moves only (count, customers-with-that-count) pairs."""
    c, o = tables(spark, sf_dir, "customer", "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q14_promo_share",
    oracle=f"""
SELECT CAST(100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                  THEN {_rev_duck("l")}
                  ELSE CAST(0 AS DECIMAL(14,4)) END) AS DOUBLE)
       / CAST(SUM({_rev_duck("l")}) AS DOUBLE) AS DOUBLE) AS promo_share
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-06-01'
  AND l.l_shipdate < TIMESTAMP '1997-07-01'
""",
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q14: PROMO parts' percentage of one month's revenue. Same
    one-pass conditional-sum discipline as q8 — numerator and denominator
    from a single scan+join+aggregate, never two scans joined back. Part
    broadcasts un-filtered here (the CASE needs non-PROMO rows too); the
    month filter pushes to the lineitem scan."""
    l, p = tables(spark, sf_dir, "lineitem", "part")
    promo_rev = F.when(F.col("p_type") == "PROMO", _rev_spark()).otherwise(
        F.lit(0).cast("decimal(14,4)")
    )
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
        )
        .join(p, F.col("l_partkey") == F.col("p_partkey"))  # part ∝ SF: unhinted
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo_rev).cast("double")
                / F.sum(_rev_spark()).cast("double")
            ).alias("promo_share")
        )
    )


@register(
    "q15_top_supplier",
    oracle=f"""
WITH rev AS (
  SELECT l_suppkey,
         SUM({_REV_DUCK}) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, CAST(r.total_rev AS DOUBLE) AS total_rev
FROM rev r
JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q15: the supplier(s) with maximum revenue in 1997-Q1. The
    oracle's scalar MAX subquery over the CTE becomes an unpartitioned
    window MAX over the supplier-sized aggregate (q11's pattern — global
    windows are fine on dimension-cardinality data, never on facts), so
    lineitem is scanned once. Revenue ties all survive: no arbitrary pick,
    deterministic under any partitioning."""
    from pyspark.sql import Window

    l, s = tables(spark, sf_dir, "lineitem", "supplier")
    rev = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_rev_spark()).alias("total_rev"))
    )
    best = rev.withColumn(
        "max_rev", F.max("total_rev").over(Window.partitionBy())
    ).filter(F.col("total_rev") == F.col("max_rev"))
    # supplier ∝ SF: unhinted (q7/q8 rule); AQE broadcasts while it fits
    return best.join(s, best.l_suppkey == s.s_suppkey).select(
        "s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_rev")
    )


@register(
    "q16_supplier_variety",
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#5'
  AND p.p_size IN (1, 5, 9, 13, 17, 21)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
""",
)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q16 shape (no partsupp: the observed lineitem relation is the
    supplier-part catalog; no comment column: negative account balance is
    the supplier exclusion). Distinct suppliers able to supply each
    (brand, type, size) bucket. The NOT IN becomes a broadcast LEFT ANTI
    join against the (tiny) excluded-supplier set — null-safe here because
    keys are non-null; part pre-filters before broadcast."""
    l, p, s = tables(spark, sf_dir, "lineitem", "part", "supplier")
    p_f = p.filter(
        (F.col("p_brand") != "Brand#5")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21)
    )
    excluded = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        # both sides ∝ SF (supplier subset, filtered part): unhinted
        l.join(excluded, l.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(p_f, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(10,2))) AS DOUBLE) / 7.0
         AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#3' AND p.p_type = 'SMALL'
  AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
                      WHERE l2.l_partkey = l.l_partkey)
""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q17: lost revenue from orders below 20% of a part's average
    order quantity. The correlated AVG decorrelates to a window mean over
    the part key — valid because partkey determines brand/type, so
    averaging the brand-filtered join output equals averaging all of the
    part's lineitems, one pass instead of a per-row rescan. Quantities are
    integer-valued doubles: their sum is exact in IEEE whatever the
    partition order, so the 0.2×avg threshold is deterministic."""
    from pyspark.sql import Window

    l, p = tables(spark, sf_dir, "lineitem", "part")
    p_f = p.filter((F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL"))
    joined = l.join(p_f, l.l_partkey == p.p_partkey)  # filtered part ∝ SF: unhinted
    avg_qty = F.avg("l_quantity").over(Window.partitionBy("l_partkey"))
    return (
        joined.withColumn("avg_qty", avg_qty)
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(10,2)")).cast("double")
                / 7.0
            ).alias("avg_yearly")
        )
    )


@register(
    "q19_disjunctive_predicates",
    oracle=f"""
SELECT CAST(SUM({_rev_duck("l")}) AS DOUBLE) AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 1 AND l.l_quantity <= 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity >= 10 AND l.l_quantity <= 20)
   OR (p.p_brand = 'Brand#4' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity >= 20 AND l.l_quantity <= 30)
""",
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q19: revenue from three OR-ed (brand, size, quantity) windows.
    The single-table implications are extracted and pushed BEFORE the join
    — part shrinks to the three brands (broadcast hash table holds ~12% of
    part), lineitem to the quantity hull [1, 30] at the scan — and the full
    disjunction stays as the residual filter on joined rows. The naive plan
    (filter after join, unfiltered broadcast) does the same join at 8× the
    hash-table size."""
    l, p = tables(spark, sf_dir, "lineitem", "part")
    p_f = p.filter(F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#4"))
    l_f = l.filter((F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 30))
    branch = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & (F.col("p_size") >= 1) & (F.col("p_size") <= smax)
        & (F.col("l_quantity") >= qlo) & (F.col("l_quantity") <= qhi)
    )
    return (
        l_f.join(p_f, F.col("l_partkey") == F.col("p_partkey"))  # part ∝ SF: unhinted
        .filter(
            branch("Brand#12", 15, 1, 11)
            | branch("Brand#23", 25, 10, 20)
            | branch("Brand#4", 35, 20, 30)
        )
        .agg(F.sum(_rev_spark()).cast("double").alias("revenue"))
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
SELECT s.s_name, COUNT(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
GROUP BY 1
ORDER BY numwait DESC, s_name
LIMIT 50
""",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q21 shape (late = shipped >90 days after order date, standing
    in for receipt-past-commit): suppliers solely responsible for delaying
    multi-supplier finished orders. The EXISTS / NOT-EXISTS pair
    decorrelates into aggregates instead of correlated rescans, and the
    whole query is ONE pass over the fact: join orders(F), pre-aggregate
    late-row counts per (order, supplier) — the only fact-sized shuffle,
    with map-side partial agg — then an orderkey window over that shrunken
    set derives the order verdict (distinct suppliers ≥ 2 = 'someone else
    exists'; exactly 1 late supplier = 'nobody else was late'). The naive
    two-branch plan (aggregate verdict, re-join late rows) scans lineitem
    twice because the branches' pushed filters diverge — 2× fact I/O at
    100 TB. Summing late_rows per supplier equals the oracle's per-l1
    COUNT(*)."""
    from pyspark.sql import Window

    l, o, s = tables(spark, sf_dir, "lineitem", "orders", "supplier")
    o_f = o.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    late = (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    ).cast("int")
    per_os = (
        l.join(o_f, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.sum(late).alias("late_rows"))
    )
    w = Window.partitionBy("l_orderkey")
    verdict = per_os.withColumn("nsupp", F.count(F.lit(1)).over(w)).withColumn(
        "nlate", F.sum((F.col("late_rows") > 0).cast("int")).over(w)
    )
    return (
        verdict.filter(
            (F.col("late_rows") > 0) & (F.col("nsupp") >= 2) & (F.col("nlate") == 1)
        )
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))  # supplier ∝ SF: unhinted
        .groupBy("s_name")
        .agg(F.sum("late_rows").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(50)
    )


@register(
    "q22_idle_customers",
    oracle="""
SELECT c.c_nationkey, COUNT(*) AS numcust,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM customer c
WHERE c.c_acctbal > (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(12,2)))
                                 AS DOUBLE) / COUNT(*)
                     FROM customer c2 WHERE c2.c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY 1
""",
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q22 shape (nationkey stands in for the phone country code):
    wealthy customers (balance above the positive-balance average) with no
    recent orders, by nation. The scalar threshold is computed ONCE as a
    1-row aggregate and broadcast-crossed onto customer (whitelisted tiny
    nested loop — q11's window trick would single-partition the customer
    table, wrong for a dimension that is itself large at scale); the
    NOT EXISTS is an anti join against recent orders. The average is
    decimal-sum / count — exact, so the > threshold can't flake across
    partition orders."""
    c, o = tables(spark, sf_dir, "customer", "orders")
    threshold = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(12,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_bal")
        )
    )
    recent = o.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select("o_custkey")
    return (
        c.crossJoin(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(12,2)"))
            .cast("double")
            .alias("totacctbal"),
        )
    )


MIN_BASKET_SUPPORT = 3  # pair must co-occur in >= this many orders


@register(
    "x_basket_pairs",
    oracle=f"""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
n_orders AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM items),
part_freq AS (SELECT l_partkey, COUNT(*) AS f FROM items GROUP BY 1),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS support
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= {MIN_BASKET_SUPPORT}
)
SELECT part_a, part_b, support,
       CAST(support AS DOUBLE) * n.n / (fa.f * fb.f) AS lift
FROM pairs
JOIN part_freq fa ON fa.l_partkey = part_a
JOIN part_freq fb ON fb.l_partkey = part_b
CROSS JOIN n_orders n
""",
)
def x_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket analysis: part pairs co-purchased in ≥{s} orders,
    with lift = P(a,b) / (P(a)·P(b)). The pair join is keyed on the
    ORDER (self-join on orderkey), so candidates are bounded by
    Σ_orders (basket_size choose 2) — linear in orders for bounded
    baskets, never a part×part pass; the tiny global order count
    broadcasts as a 1-row aggregate onto the support aggregate. The
    per-part frequency joins are NOT hinted: part_freq has one row per
    distinct part in the fact — unbounded, SF-scaled — so a forced
    broadcast would abort at the limit at 100 TB; pairs is already
    hash-partitioned by (part_a, part_b) from its groupBy and AQE picks
    broadcast only while the frequency table actually fits. This is
    the co-occurrence shape (item2item recommenders, term co-occurrence
    matrices) at any scale. Counts are exact integers; lift is one IEEE
    expression."""
    (l,) = tables(spark, sf_dir, "lineitem")
    items = l.select("l_orderkey", "l_partkey").distinct()
    n_orders = items.select(
        F.countDistinct("l_orderkey").alias("n_orders_total")
    )
    part_freq = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("f"))
    a = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a"))
    b = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, on="ok")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= MIN_BASKET_SUPPORT)
    )
    fa = part_freq.select(F.col("l_partkey").alias("part_a"), F.col("f").alias("fa"))
    fb = part_freq.select(F.col("l_partkey").alias("part_b"), F.col("f").alias("fb"))
    return (
        pairs.join(fa, "part_a")
        .join(fb, "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "support",
            (
                F.col("support").cast("double")
                * F.col("n_orders_total")
                / (F.col("fa") * F.col("fb"))
            ).alias("lift"),
        )
    )


x_basket_pairs.__doc__ = x_basket_pairs.__doc__.format(s=MIN_BASKET_SUPPORT)
# @register captured the raw docstring before the .format above — keep the
# registry's doc (what catalog UIs read) in sync with the rendered one
from .catalog import _REGISTRY as _REG  # noqa: E402

_REG["x_basket_pairs"].doc = x_basket_pairs.__doc__


@register(
    "q20_dominant_suppliers",
    oracle="""
WITH shipped AS (
  SELECT l_partkey, l_suppkey,
         SUM(CAST(l_quantity AS DECIMAL(12,1))) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY 1, 2
)
SELECT s.s_name, n.n_name AS supp_nation,
       CAST(COUNT(*) AS BIGINT) AS n_dominated_parts
FROM shipped sh
JOIN part p ON p.p_partkey = sh.l_partkey AND p.p_type = 'SMALL'
JOIN supplier s ON s.s_suppkey = sh.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE sh.qty > (SELECT 0.5 * SUM(sh2.qty) FROM shipped sh2
                WHERE sh2.l_partkey = sh.l_partkey)
GROUP BY 1, 2
ORDER BY n_dominated_parts DESC, s_name
LIMIT 50
""",
)
def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q20 shape (no partsupp availqty: 'excess stock' becomes
    'dominant supplier' — shipped more than half a part's 1997 volume).
    The correlated half-of-total subquery decorrelates to a window SUM
    over the partkey on the (part, supplier)-level aggregate — the fact
    is scanned once and the window runs on the pre-aggregated frame
    (q11/q15's discipline). SMALL-part filter broadcasts before the
    dimension joins; counting dominated parts per supplier ends in a
    TakeOrdered heap with a name tiebreak."""
    from pyspark.sql import Window

    l, p, s, n = tables(spark, sf_dir, "lineitem", "part", "supplier", "nation")
    shipped = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,1)")).alias("qty"))
    )
    total = F.sum("qty").over(Window.partitionBy("l_partkey"))
    dominant = shipped.withColumn("part_total", total).filter(
        F.col("qty") > 0.5 * F.col("part_total")
    )
    return (
        dominant.join(
            # SMALL-filtered, but still ∝ SF — unhinted (q7/q8 rule)
            p.filter(F.col("p_type") == "SMALL"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))  # supplier ∝ SF: unhinted
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name", F.col("n_name").alias("supp_nation"))
        .agg(F.count(F.lit(1)).alias("n_dominated_parts"))
        .orderBy(F.desc("n_dominated_parts"), "s_name")
        .limit(50)
    )
