"""Reference-parity queries: SURVEY.md §2's operator inventory, one named
query per operator (or tight operator cluster), each with a DuckDB oracle.

Reference sites are cited per query; the Spark side exercises the engine's
``ops``/``sinks`` modules where the operator has one, otherwise plain
DataFrame API. Scale notes inline: these run at sf=0.01 for the oracle but
are written for the 100 TB plan shape (broadcast dims, single-shuffle aggs,
anti-join merges that broadcast the small batch side).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ops.history import append_only_delta
from ..ops.keys import carry_forward_keys
from ..ops.normalize import explode_with_parent, flatten_structs
from .catalog import register, tables


def dec_sum(c: Column | str, alias: str, scale: str = "decimal(28,10)") -> Column:
    """Order-independent (exact) sum of a double metric: cast each value to
    decimal, sum exactly, cast back to double. Bit-identical across Spark
    partitionings and to DuckDB's same formula."""
    col = F.col(c) if isinstance(c, str) else c
    return F.sum(col.cast(scale)).cast("double").alias(alias)


def _dsum(expr: str) -> str:
    """DuckDB twin of ``dec_sum``."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(28,10))) AS DOUBLE)"


# ---------------------------------------------------------------------------
# Flagship slice (SURVEY §7.4): U1 union + literal discriminators, K7/J3
# anti-join history capture. Reference: dags/sql-queries/bexio_and_stripe/
# shore_bexio_all.py:53-57 + execute_bexio_and_stripe_sql_queries.py:45-57.
# ---------------------------------------------------------------------------


@register(
    "flagship_union_history",
    oracle="""
WITH all_src AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice AS total_price, o_orderdate,
         'bexio_de' AS source, 'blank' AS status
  FROM orders WHERE o_custkey % 2 = 0
  UNION ALL
  SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate, 'bexio_ch', 'blank'
  FROM orders WHERE o_custkey % 2 = 1
), history AS (
  SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderdate < DATE '1997-01-01'
)
SELECT a.* FROM all_src a
LEFT JOIN history h
  ON a.o_orderkey = h.o_orderkey AND a.o_orderstatus = h.o_orderstatus
WHERE h.o_orderkey IS NULL
""",
)
def flagship_union_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union two regional slices with injected source/status literals, then
    capture only (key,status) combos absent from history (append-only
    change capture). The engine spine: scan → project → union → anti-join."""
    (orders,) = tables(spark, sf_dir, "orders")
    de = orders.filter(F.col("o_custkey") % 2 == 0).withColumns(
        {"source": F.lit("bexio_de"), "status": F.lit("blank")}
    )
    ch = orders.filter(F.col("o_custkey") % 2 == 1).withColumns(
        {"source": F.lit("bexio_ch"), "status": F.lit("blank")}
    )
    all_src = de.unionByName(ch).select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").alias("total_price"),
        "o_orderdate",
        "source",
        "status",
    )
    history = orders.filter(F.col("o_orderdate") < F.lit("1997-01-01").cast("date")).select(
        "o_orderkey", "o_orderstatus"
    )
    return append_only_delta(all_src, history, ["o_orderkey", "o_orderstatus"])


# ---------------------------------------------------------------------------
# Headline analytics (bench queries): TPC-H-shaped aggregation/join plans.
# These are the plans the reference pushes into BigQuery SQL (S9); at 100 TB
# they are the shuffle-dominated workload, so: dims broadcast, one hash
# shuffle per groupBy, partial aggregation map-side (Spark default).
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(10,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))))
            AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
                * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2))))
            AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(10,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing-summary rollup (TPC-H Q1 shape): single-pass grouped
    aggregation with derived measures — the A3 conditional-rollup family at
    full width. One shuffle on a low-cardinality key; map-side partial agg
    makes it scan-bound at any scale.

    Numeric note: the raw columns are 2-decimal money values, so casting
    THEM to decimal is unambiguous and all downstream decimal arithmetic is
    exact in both engines; casting a computed double product to decimal
    would round at the scale boundary and flake (observed at scale 10)."""
    (li,) = tables(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(10,2)")
    one = F.lit(1).cast("decimal(3,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    tax = F.col("l_tax").cast("decimal(4,2)")
    qty = F.col("l_quantity").cast("decimal(10,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (one - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (one - disc) * (one + tax)).cast("double").alias("sum_charge"),
            (F.sum(qty).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(disc).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q3_top_revenue_orders",
    oracle=f"""
SELECT l_orderkey, {_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
       o_orderdate
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top unshipped-revenue orders (TPC-H Q3 shape): selective dim filter →
    fact join → grouped top-k. ``customer`` is broadcast (dimension-sized);
    the lineitem/orders join shuffles on orderkey once. Tiebreak on the key
    keeps the LIMIT deterministic."""
    customer, orders, li = tables(spark, sf_dir, "customer", "orders", "lineitem")
    return (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
        .hint("broadcast")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle=f"""
SELECT n_name, {_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
""",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier volume (TPC-H Q5 shape) — the J2 CTE-join pattern
    (dags/hubspot/BM/hubspot_bm_contact_role.py:136-159) at scale.

    The ASIA restriction is PUSHED AHEAD of the fact joins: Spark does
    not reorder joins without CBO stats, so filtering customer and
    supplier through the broadcast ASIA nation-key set FIRST shrinks
    every subsequent exchange by the region's ~1/5 selectivity —
    restricting only at the final region join would shuffle 5× the rows
    through both fact exchanges. region/nation are the only force-
    broadcast dims (bounded at 5/25 rows at ANY scale); customer and
    supplier shuffle on their keys — at 100 TB they are fact-sized and
    a broadcast hint on them would abort the job outright (AQE still
    broadcasts them at small SF on its own)."""
    c, o, li, s, n, r = tables(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region"
    )
    asia_nations = (
        n.join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .select("n_nationkey", "n_name")
    )
    c_asia = c.join(
        F.broadcast(asia_nations.select("n_nationkey")),
        F.col("c_nationkey") == F.col("n_nationkey"),
        "left_semi",
    )
    s_asia = s.join(
        F.broadcast(asia_nations),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    return (
        c_asia.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s_asia,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


# ---------------------------------------------------------------------------
# Projections / filters (SURVEY P1-P6)
# ---------------------------------------------------------------------------


@register(
    "p1_p2_project_rename",
    oracle="""
SELECT o_orderkey, o_orderdate, o_orderstatus, o_totalprice AS total_price
FROM orders
""",
)
def p1_p2_project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 desired_order column select/reorder + P2 rename map (reference
    dags/bexio/bexio_invoice_and_line_items_de.py:175-182,
    dags/hubspot/churn_reasons/churn_reasons.py:73-98). Pure projection —
    Catalyst prunes the parquet ReadSchema to exactly these columns."""
    (orders,) = tables(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey", "o_orderdate", "o_orderstatus", "o_totalprice"
    ).withColumnsRenamed({"o_totalprice": "total_price"})


@register(
    "p3_p4_p5_predicates",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment, c_acctbal
FROM customer
WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
  AND c_name IS NOT NULL
  AND c_name != ''
  AND UPPER(c_mktsegment) != 'X'
  AND c_acctbal > 100.0
""",
)
def p3_p4_p5_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 IN-list + P4 null predicates + P5 compound normalized string
    predicate (reference churn_reasons.py:71, hubspot_bm_company_status_v2.py:
    140-144, hubspot_pos_contact_role.py:161-164). All of these reach the
    parquet scan as PushedFilters."""
    (customer,) = tables(spark, sf_dir, "customer")
    return customer.select("c_custkey", "c_name", "c_mktsegment", "c_acctbal").filter(
        F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")
        & F.col("c_name").isNotNull()
        & (F.col("c_name") != "")
        & (F.upper(F.col("c_mktsegment")) != "X")
        & (F.col("c_acctbal") > 100.0)
    )


@register(
    "p6_date_boundary",
    oracle="""
SELECT l_orderkey, l_linenumber, l_shipdate
FROM lineitem
WHERE CAST(l_shipdate AS DATE) = last_day(CAST(l_shipdate AS DATE))
""",
)
def p6_date_boundary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 date predicate against a computed boundary (reference
    ``WHERE DATE(MONTH) = LAST_DAY(CURRENT_DATE)``,
    dags/hubspot/BM/hubspot_bm_company_status_v3.py:139) — restated against
    a data-derived boundary so the oracle is time-independent."""
    (li,) = tables(spark, sf_dir, "lineitem")
    return li.select("l_orderkey", "l_linenumber", "l_shipdate").filter(
        F.to_date("l_shipdate") == F.last_day(F.to_date("l_shipdate"))
    )


# ---------------------------------------------------------------------------
# Joins (SURVEY J1-J7), merge semantics as queries (K1), history (K7/J3/J4)
# ---------------------------------------------------------------------------


@register(
    "j1_carry_forward_keys",
    oracle="""
WITH existing AS (
  SELECT o_orderkey, 'u-' || CAST(o_orderkey AS VARCHAR) AS u_id, o_orderdate AS created_at
  FROM orders WHERE o_orderkey % 3 = 0
), batch AS (
  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 2 = 0
)
SELECT b.o_orderkey, b.o_totalprice,
       COALESCE(e.u_id, 'new-' || CAST(b.o_orderkey AS VARCHAR)) AS u_id,
       COALESCE(e.created_at, TIMESTAMP '1995-01-01 00:00:00') AS created_at
FROM batch b LEFT JOIN existing e ON b.o_orderkey = e.o_orderkey
""",
)
def j1_carry_forward_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 upsert-key carry-forward: LEFT JOIN the existing table on the
    business key; keep existing u_id/created_at, mint defaults for new keys
    (reference iterrows+.loc loop, bexio_invoice_and_line_items_de.py:155-162).
    Defaults here are deterministic stand-ins for uuid()/now() (SURVEY §7.5).
    ``broadcast_existing=False``: this gate's existing side is a THIRD of
    the fact table — a forced broadcast hint bypasses the size threshold
    AND AQE demotion, and at 100 TB blows Spark's broadcast-table limit
    outright. The hint belongs only on genuinely bounded existing sets
    (the bexio job's key table); here the shuffle join is the honest
    plan, and AQE still demotes to broadcast at small SF on its own."""
    (orders,) = tables(spark, sf_dir, "orders")
    existing = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey",
        F.concat(F.lit("u-"), F.col("o_orderkey").cast("string")).alias("u_id"),
        F.col("o_orderdate").alias("created_at"),
    )
    batch = orders.filter(F.col("o_orderkey") % 2 == 0).select("o_orderkey", "o_totalprice")
    return carry_forward_keys(
        batch,
        existing,
        "o_orderkey",
        broadcast_existing=False,
        carried={
            "u_id": F.concat(F.lit("new-"), F.col("o_orderkey").cast("string")),
            "created_at": F.lit("1995-01-01 00:00:00").cast("timestamp"),
        },
    )


@register(
    "j2_dim_enrichment",
    oracle="""
SELECT c_custkey, c_name, n_name AS nation, r_name AS region
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
""",
)
def j2_dim_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 inner equi-join enrichment (reference 3-CTE email join,
    dags/hubspot/BM/hubspot_bm_contact_role.py:136-159). Both dims broadcast:
    zero shuffles at any fact-table scale."""
    c, n, r = tables(spark, sf_dir, "customer", "nation", "region")
    return (
        c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey", "c_name", F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
    )


@register(
    "j3_j4_k7_history_delta",
    oracle="""
WITH snapshot AS (
  SELECT user_id, event_type, CAST(ts AS DATE) AS event_date,
         value > 50.0 AS is_large
  FROM events
), history AS (
  SELECT DISTINCT user_id, event_type, CAST(ts AS DATE) AS event_date,
         value > 50.0 AS is_large
  FROM events WHERE event_id % 2 = 0
)
SELECT DISTINCT s.* FROM snapshot s
LEFT JOIN history h
  ON s.user_id = h.user_id AND s.event_type = h.event_type
 AND s.event_date = h.event_date AND s.is_large = h.is_large
WHERE h.user_id IS NULL
""",
)
def j3_j4_k7_history_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3/J4/K7: anti-join change capture on a 4-column composite key
    (reference NOT EXISTS, dags/finance/disputed_invoices/stripe_dispute.py:
    36-43; LEFT JOIN … IS NULL, execute_bexio_and_stripe_sql_queries.py:52-56).
    At scale the history side is the big one — keyed on the same columns as
    the snapshot batch, so the anti-join broadcast-reverses under AQE."""
    (events,) = tables(spark, sf_dir, "events")
    keyed = events.select(
        "user_id",
        "event_type",
        F.to_date("ts").alias("event_date"),
        (F.col("value") > 50.0).alias("is_large"),
    )
    # history = even event_ids' key combos; snapshot = all rows
    history = (
        events.filter(F.col("event_id") % 2 == 0)
        .select(
            "user_id",
            "event_type",
            F.to_date("ts").alias("event_date"),
            (F.col("value") > 50.0).alias("is_large"),
        )
        .distinct()
    )
    return append_only_delta(
        keyed,
        history,
        ["user_id", "event_type", "event_date", "is_large"],
        dedup_batch=True,  # events repeat key combos; oracle SELECTs DISTINCT
    )


@register(
    "j5_semi_join",
    oracle="""
SELECT o_orderkey, o_totalprice FROM orders
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45.0)
""",
)
def j5_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 semi-join (reference ``DELETE WHERE id IN (SELECT id FROM temp)``,
    dags/stripe/stripe_charges.py:27-29): orders having at least one
    high-quantity line. left_semi never materializes the probe side's
    payload columns."""
    orders, li = tables(spark, sf_dir, "orders", "lineitem")
    big = li.filter(F.col("l_quantity") > 45.0).select(F.col("l_orderkey").alias("o_orderkey"))
    return orders.select("o_orderkey", "o_totalprice").join(big, "o_orderkey", "left_semi")


@register(
    "k1_merge_upsert",
    oracle="""
WITH existing AS (
  SELECT o_orderkey, o_totalprice, 'existing' AS src FROM orders WHERE o_orderkey % 2 = 0
), batch AS (
  SELECT o_orderkey, o_totalprice * 1.1 AS o_totalprice, 'batch' AS src
  FROM orders WHERE o_orderkey % 3 = 0
)
SELECT * FROM existing e WHERE NOT EXISTS (SELECT 1 FROM batch b WHERE b.o_orderkey = e.o_orderkey)
UNION ALL
SELECT * FROM batch
""",
)
def k1_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1/K6 delete+insert upsert semantics as a relational expression:
    batch rows replace same-key existing rows, everything else survives
    (reference DELETE WHERE id IN … + INSERT,
    dags/bexio/bexio_invoice_and_line_items_de.py:147-150,182-186,362-386).
    The file-backed atomic version is sinks.merge.ParquetTable.merge_upsert;
    this query is its logical core: existing LEFT ANTI batch ∪ batch. No
    broadcast HINT on the anti-join: this gate's batch is a third of the
    fact table, and a forced hint would blow the broadcast limit at
    100 TB — AQE broadcasts small batches on its own and shuffles big
    ones (exactly the broadcast_batch=False escape hatch
    sinks.merge.merge_upsert documents for backfills)."""
    (orders,) = tables(spark, sf_dir, "orders")
    existing = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice", F.lit("existing").alias("src")
    )
    batch = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey",
        (F.col("o_totalprice") * 1.1).alias("o_totalprice"),
        F.lit("batch").alias("src"),
    )
    survivors = existing.join(
        batch.select("o_orderkey"), "o_orderkey", "left_anti"
    )
    return survivors.unionByName(batch)


# ---------------------------------------------------------------------------
# Aggregations (SURVEY A1-A6), reverse-ETL grouping (A5/K8)
# ---------------------------------------------------------------------------


@register(
    "a1_a2_distinct_dedup",
    oracle="SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
)
def a1_a2_distinct_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 DISTINCT projection / A2 group-by-as-dedup (reference
    hubspot_bm_company_status_v2.py:140-144, hubspot_bm_contact_role.py:
    136-141). Partial (map-side) dedup happens before the shuffle."""
    (customer,) = tables(spark, sf_dir, "customer")
    return customer.select("c_nationkey", "c_mktsegment").dropDuplicates()


@register(
    "a3_conditional_rollup",
    oracle=f"""
SELECT user_id,
       {_dsum("CASE WHEN event_type = 'purchase' THEN value ELSE 0 END")} AS purchase_total,
       {_dsum("CASE WHEN event_type IN ('view','click') THEN value ELSE 0 END")} AS engagement_total,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error_count,
       COUNT(*) AS n_events
FROM events
GROUP BY user_id
""",
)
def a3_conditional_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 conditional-sum pivot rollup (reference Stripe per-account
    balance/payout/volume, dags/stripe/account.py:39-76): the per-row
    sub-scan + python accumulation becomes one grouped pass with
    sum(when(...)). Single shuffle on user_id."""
    (events,) = tables(spark, sf_dir, "events")
    v = F.col("value")
    t = F.col("event_type")
    return events.groupBy("user_id").agg(
        dec_sum(F.when(t == "purchase", v).otherwise(F.lit(0)), "purchase_total"),
        dec_sum(F.when(t.isin("view", "click"), v).otherwise(F.lit(0)), "engagement_total"),
        F.sum(F.when(t == "error", 1).otherwise(0)).alias("error_count"),
        F.count("*").alias("n_events"),
    )


@register(
    "a4_max_watermark",
    oracle="SELECT MAX(event_id) AS watermark FROM events",
)
def a4_max_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 MAX watermark (reference max(Id) cursor advance,
    dags/billwerk/billwerk_invoices.py:93). Engine-side the value feeds
    sinks.merge.WatermarkStore.advance post-commit."""
    (events,) = tables(spark, sf_dir, "events")
    return events.agg(F.max("event_id").alias("watermark"))


@register(
    "a5_first_wins_merge",
    oracle="""
SELECT user_id,
       min_by(event_type, event_id) AS first_event_type,
       min_by(value, event_id) AS first_value
FROM events GROUP BY user_id
""",
)
def a5_first_wins_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 first-wins dict merge (reference create_or_update_property,
    dags/hubspot/BM/hubspot_bm_company_status_v2.py:122-132): 'first' is
    made deterministic by anchoring on the event_id order via min_by —
    never bare first()/any_value(), which are partition-order dependent."""
    (events,) = tables(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.min_by("event_type", "event_id").alias("first_event_type"),
        F.min_by("value", "event_id").alias("first_value"),
    )


@register(
    "a6_count_accounting",
    oracle="SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type",
)
def a6_count_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 row-count accounting (reference logging row counts,
    dags/billwerk/billwerk_invoices.py:81,96)."""
    (events,) = tables(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(F.count("*").alias("n"))


@register(
    "a4_a6_watermark_accounting",
    oracle="""
SELECT e.event_type, e.n, w.watermark
FROM (SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type) e
CROSS JOIN (SELECT MAX(event_id) AS watermark FROM events) w
""",
)
def a4_a6_watermark_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 + A6 combined parity gate: per-type row-count accounting (A6,
    reference dags/billwerk/billwerk_invoices.py:81,96) carrying the MAX
    watermark the cursor would advance to (A4,
    dags/billwerk/billwerk_invoices.py:93) — exactly the summary row a
    sync job logs per run. One fact scan feeds both aggregates; the 1-row
    watermark side is broadcast into a nested-loop join, the right plan
    for a scalar attach at any scale. Registered as one query so both §2
    gates share a single driver-window slot (the standalone
    ``a4_max_watermark`` / ``a6_count_accounting`` entries remain in the
    catalog beyond the window)."""
    (events,) = tables(spark, sf_dir, "events")
    counts = events.groupBy("event_type").agg(F.count("*").alias("n"))
    wm = events.agg(F.max("event_id").alias("watermark"))
    return counts.crossJoin(F.broadcast(wm))


@register(
    "k8_reverse_etl_batches",
    oracle=f"""
WITH per_key AS (
  SELECT user_id,
         COUNT(*) AS n_events,
         {_dsum('value')} AS total_value,
         MAX(ts) AS last_seen
  FROM events GROUP BY user_id
)
SELECT user_id, n_events, total_value, last_seen,
       CAST(floor((ROW_NUMBER() OVER (ORDER BY user_id) - 1) / 100) AS BIGINT) AS batch_id
FROM per_key
""",
)
def k8_reverse_etl_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K8 reverse-ETL batch assembly (reference group rows per company then
    batch 100 per POST, dags/hubspot/BM/hubspot_bm_company_status_v3.py:
    66-100): grouped rollup + deterministic batch numbering. The actual POST
    is sinks.reverse.post_batches (foreachPartition); batching here is the
    SQL-checkable half.

    Numbering is TWO-PHASE: a bare Window.orderBy(user_id) would
    single-partition the whole per-user rollup (one task sorts every
    user — the exact anti-pattern q22's docstring calls out). Instead:
    range-partition on the unique key, number locally per partition,
    and add broadcast per-partition offsets — the global sequence is
    identical for ANY range boundaries (offsets come from actual
    counts), so the output is deterministic while every phase stays
    parallel."""
    from pyspark.sql import Window

    (events,) = tables(spark, sf_dir, "events")
    per_key = events.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        dec_sum("value", "total_value"),
        F.max("ts").alias("last_seen"),
    )
    parts = per_key.repartitionByRange(64, "user_id").withColumn(
        "_pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("_pid").orderBy("user_id")
    local = parts.withColumn("_lrk", F.row_number().over(w_local))
    # offsets: cumulative counts over <=64 rows — the unpartitioned
    # window is fine HERE because its input is partition-count-sized
    w_off = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        local.groupBy("_pid")
        .agg(F.count("*").alias("_n"))
        .withColumn("_off", F.coalesce(F.sum("_n").over(w_off), F.lit(0)))
        .select("_pid", "_off")
    )
    # floor() explicitly: Spark's double→long cast truncates but DuckDB's
    # rounds, so a bare cast disagrees at batch boundaries
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(
            "batch_id",
            F.floor((F.col("_off") + F.col("_lrk") - 1) / 100).cast("long"),
        )
        .select("user_id", "n_events", "total_value", "last_seen", "batch_id")
    )


@register(
    "u2_vertical_concat",
    oracle="""
SELECT p_partkey, p_name, p_brand FROM part WHERE p_size < 15
UNION ALL
SELECT p_partkey, p_name, p_brand FROM part WHERE p_size >= 15 AND p_size < 35
UNION ALL
SELECT p_partkey, p_name, p_brand FROM part WHERE p_size >= 35
""",
)
def u2_vertical_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 vertical concat of N frames (reference pd.concat of page/detail
    frames, bexio_invoice_and_line_items_de.py:212-213) — reduce over
    unionByName; the union is plan-level only (no shuffle, no data
    movement beyond the scans)."""
    from functools import reduce

    (part,) = tables(spark, sf_dir, "part")
    slices = [
        part.filter(F.col("p_size") < 15),
        part.filter((F.col("p_size") >= 15) & (F.col("p_size") < 35)),
        part.filter(F.col("p_size") >= 35),
    ]
    frames = [s.select("p_partkey", "p_name", "p_brand") for s in slices]
    return reduce(DataFrame.unionByName, frames)


@register(
    "a7_rollup_hierarchy",
    oracle="""
SELECT o_orderstatus, CAST(year(o_orderdate) AS INT) AS order_year,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
FROM orders
GROUP BY ROLLUP(o_orderstatus, year(o_orderdate))
""",
)
def a7_rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals via ROLLUP — absent from the reference
    (SURVEY §2.5 'no grouping sets') but table stakes for a warehouse
    engine; Spark computes all grouping levels in one Expand+aggregate
    pass (one shuffle, not one scan per level)."""
    (o,) = tables(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", F.year("o_orderdate").alias("order_year"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast("double").alias("total"),
        )
    )


@register(
    "a9_cube_status_priority",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
       CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
""",
)
def a9_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE over (status, priority) with GROUPING flags to tell a real
    NULL from a subtotal row — the remaining member of the grouping-sets
    family next to a7's ROLLUP. Same Expand+aggregate execution: all four
    grouping levels in one shuffle, not four scans."""
    (o,) = tables(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_priority"),
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
        .cast("double")
        .alias("total"),
    )


@register(
    "a8_percentiles",
    oracle="""
SELECT o_orderstatus,
       quantile_cont(o_totalprice, 0.25) AS p25,
       quantile_cont(o_totalprice, 0.50) AS p50,
       quantile_cont(o_totalprice, 0.90) AS p90,
       MAX(o_totalprice) AS pmax
FROM orders GROUP BY o_orderstatus
""",
)
def a8_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (both engines use linear
    interpolation on the sorted values — verified bit-identical). At 100 TB
    the exact form sorts within groups; approx_percentile (t-digest) is the
    constant-memory alternative when error tolerance allows (not oracle-able
    — sketch internals differ across engines)."""
    (o,) = tables(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.percentile("o_totalprice", F.lit(0.25)).alias("p25"),
        F.percentile("o_totalprice", F.lit(0.50)).alias("p50"),
        F.percentile("o_totalprice", F.lit(0.90)).alias("p90"),
        F.max("o_totalprice").alias("pmax"),
    )


# ---------------------------------------------------------------------------
# Sorts / limits / pagination (SURVEY O1/O2, S4 incremental)
# ---------------------------------------------------------------------------


@register(
    "o1_order_limit_offset",
    oracle="SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 500 OFFSET 300",
)
def o1_order_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 ORDER BY + LIMIT + OFFSET warehouse page (reference
    ``order by invoice_id limit 500 offset 3000``,
    dags/lex_office/lex_office_invoice_items.py:55-59). Unique sort key →
    deterministic page. Note: OFFSET pagination is O(offset) even in Spark —
    the engine's incremental sources use keyset pagination instead (S4)."""
    (orders,) = tables(spark, sf_dir, "orders")
    return orders.select("o_orderkey", "o_totalprice").orderBy("o_orderkey").offset(300).limit(500)


@register(
    "s4_keyset_increment",
    oracle="""
SELECT event_id, user_id, event_type, value
FROM events WHERE event_id > 5000
ORDER BY event_id LIMIT 1000
""",
)
def s4_keyset_increment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 keyset-watermark incremental slice + O2 row cap (reference
    ``from=<last_processed_id>`` + row_limit,
    dags/billwerk/billwerk_invoices.py:49-99): WHERE key > watermark ORDER BY
    key LIMIT n. The predicate pushes to the parquet scan; at 100 TB with
    key-sorted files this prunes row groups via min/max stats."""
    (events,) = tables(spark, sf_dir, "events")
    return (
        events.select("event_id", "user_id", "event_type", "value")
        .filter(F.col("event_id") > 5000)
        .orderBy("event_id")
        .limit(1000)
    )


@register(
    "s7_detail_fanout",
    oracle="""
SELECT o_orderkey, o_orderkey * CAST(2.0 AS DOUBLE) AS detail_total, TRUE AS _fetch_ok
FROM orders WHERE o_orderkey % 10 = 0
""",
)
def s7_detail_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7/J6 per-key detail fan-out (reference ThreadPoolExecutor sub-fetch,
    dags/bexio/bexio_invoice_and_line_items_de.py:190-216) through the
    engine's mapInPandas fetcher with a deterministic in-process transport —
    the distributed fan-out plumbing itself under the correctness gate.
    Parallelism = key-frame partitions (the MAX_WORKERS analog)."""
    from pyspark.sql import types as T

    from ..sources.rest import fanout_fetch

    (orders,) = tables(spark, sf_dir, "orders")
    keys = orders.filter(F.col("o_orderkey") % 10 == 0).select("o_orderkey")
    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("detail_total", T.DoubleType()),
            T.StructField("_fetch_ok", T.BooleanType()),
        ]
    )
    return fanout_fetch(
        keys,
        lambda k: {"o_orderkey": k, "detail_total": k * 2.0},
        schema,
        key_col="o_orderkey",
        parallelism=8,
    )


@register(
    "s9_sql_scan",
    oracle="""
WITH big AS (
  SELECT o_custkey, COUNT(*) AS n_orders
  FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 12
)
SELECT c.c_custkey, c.c_name, b.n_orders
FROM customer c JOIN big b ON c.c_custkey = b.o_custkey
""",
)
def s9_sql_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9 arbitrary warehouse SQL with temp-view staging (reference
    BigQueryExecuteQueryOperator temp-table pattern,
    dags/lex_office/lex_office_invoice_items.py:55-59,331-348): the same
    text-SQL surface via spark.sql over registered views — the staging
    temp table is just a CTE in DataFrame lineage. View names are UNIQUE
    per call and dropped on exit: temp views are session-global mutable
    state, and the catalog explicitly supports threaded staging — two
    threads registering a fixed name against different sf_dirs could
    bind one thread's SQL to the other's data (and fixed names would
    leak in the session catalog forever)."""
    import uuid as _uuid

    customer, orders = tables(spark, sf_dir, "customer", "orders")
    tag = _uuid.uuid4().hex
    cust_v, ord_v = f"s9_customer_{tag}", f"s9_orders_{tag}"
    customer.createOrReplaceTempView(cust_v)
    orders.createOrReplaceTempView(ord_v)
    try:
        # the plan is resolved eagerly here; dropping the views after
        # does not invalidate the returned DataFrame's lineage
        return spark.sql(
            f"""
            WITH big AS (
              SELECT o_custkey, COUNT(*) AS n_orders
              FROM {ord_v} GROUP BY o_custkey HAVING COUNT(*) >= 12
            )
            SELECT c.c_custkey, c.c_name, b.n_orders
            FROM {cust_v} c JOIN big b ON c.c_custkey = b.o_custkey
            """
        )
    finally:
        spark.catalog.dropTempView(cust_v)
        spark.catalog.dropTempView(ord_v)


# ---------------------------------------------------------------------------
# Nested-document normalization (SURVEY F20-F25, J7) — the nested shape is
# built in-query from lineitem (collect_list), then normalized back with the
# engine ops; the oracle states the flat truth the round-trip must preserve.
# ---------------------------------------------------------------------------


@register(
    "n_explode_with_parent",
    oracle="""
SELECT l_orderkey AS order_id, l_linenumber, l_quantity, l_extendedprice
FROM lineitem
""",
)
def n_explode_with_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F22/J7 explode array-of-structs with parent attach (reference
    extract_positions_from_order, bexio_invoice_and_line_items_de.py:221-234):
    nest lineitem into per-order position arrays, then explode back with the
    parent key renamed — the oracle checks the round trip is lossless."""
    (li,) = tables(spark, sf_dir, "lineitem")
    nested = li.groupBy("l_orderkey").agg(
        F.sort_array(
            F.collect_list(F.struct("l_linenumber", "l_quantity", "l_extendedprice"))
        ).alias("positions")
    )
    return explode_with_parent(nested, "positions", {"l_orderkey": "order_id"})


@register(
    "n_array_head_field",
    oracle="""
WITH ranked AS (
  SELECT l_orderkey, l_quantity,
         ROW_NUMBER() OVER (PARTITION BY l_orderkey
                            ORDER BY l_linenumber, l_quantity) AS rn,
         COUNT(*) OVER (PARTITION BY l_orderkey) AS n_positions
  FROM lineitem
)
SELECT l_orderkey AS order_id, l_quantity AS first_qty, n_positions
FROM ranked WHERE rn = 1
""",
)
def n_array_head_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F20 NULL-safe array-head field access (reference
    ``taxs[0]['percentage']``, bexio_invoice_and_line_items_de.py:164):
    element_at(sorted positions, 1) — the first line's quantity per order."""
    (li,) = tables(spark, sf_dir, "lineitem")
    nested = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list(F.struct("l_linenumber", "l_quantity"))).alias("positions")
    )
    return nested.select(
        F.col("l_orderkey").alias("order_id"),
        F.element_at("positions", 1)["l_quantity"].alias("first_qty"),
        F.size("positions").cast("long").alias("n_positions"),
    )


@register(
    "n_flatten_serialize",
    oracle="""
SELECT c.c_custkey,
       c_name AS info_name,
       n_name AS info_geo_nation,
       r_name AS info_geo_region,
       '{"segment":"' || c_mktsegment || '","nation_key":' || CAST(c_nationkey AS VARCHAR) || '}'
         AS custom_fields
FROM customer c
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
""",
)
def n_flatten_serialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F24 recursive struct flattening to dotted names (reference
    pd.json_normalize(max_level=N), churn_reasons.py:68, stripe_charges.py:62)
    + F25 property-bag serialization (reference json.dumps(CustomFields),
    dags/billwerk/biilwerk_contracts.py:167): build the nested doc, flatten
    with the engine op, and serialize the property bag back to a JSON string
    at the sink boundary — the nest→flatten→serialize round trip in one
    oracle-checked query. Separator is '_' here (not the reference's literal
    '.') purely so downstream column references never need backtick-quoting;
    flatten_structs defaults to '.' for reference fidelity."""
    c, n, r = tables(spark, sf_dir, "customer", "nation", "region")
    nested = (
        c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "c_custkey",
            F.struct(
                F.col("c_name").alias("name"),
                F.struct(
                    F.col("n_name").alias("nation"), F.col("r_name").alias("region")
                ).alias("geo"),
            ).alias("info"),
            F.to_json(
                F.struct(
                    F.col("c_mktsegment").alias("segment"),
                    F.col("c_nationkey").alias("nation_key"),
                )
            ).alias("custom_fields"),
        )
    )
    return flatten_structs(nested, sep="_")


@register(
    "n_nested_battery",
    oracle="""
WITH ranked AS (
  SELECT l_orderkey, l_quantity,
         ROW_NUMBER() OVER (PARTITION BY l_orderkey
                            ORDER BY l_linenumber, l_quantity) AS rn,
         COUNT(*) OVER (PARTITION BY l_orderkey) AS n_positions
  FROM lineitem
)
SELECT l_orderkey AS order_id,
       l_quantity AS head_qty,
       CAST(n_positions AS BIGINT) AS head_n,
       '{"order_id":' || CAST(l_orderkey AS VARCHAR)
         || ',"n":' || CAST(n_positions AS BIGINT) || '}' AS custom_fields
FROM ranked WHERE rn = 1
""",
)
def n_nested_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F20 + F24 + F25 combined parity gate sharing one driver-window
    slot (same move as ``a4_a6_watermark_accounting``): build each
    order's sorted positions array, take the NULL-safe array head (F20,
    reference ``taxs[0]['percentage']``), nest the head fields into a
    struct and flatten it back to dotted names with the engine op (F24,
    reference ``pd.json_normalize``), and serialize a property bag to a
    JSON string at the sink boundary (F25, reference
    ``json.dumps(CustomFields)``). The standalone
    ``n_array_head_field`` / ``n_flatten_serialize`` entries remain in
    the catalog beyond the window."""
    (li,) = tables(spark, sf_dir, "lineitem")
    nested = li.groupBy("l_orderkey").agg(
        F.sort_array(
            F.collect_list(F.struct("l_linenumber", "l_quantity"))
        ).alias("positions")
    )
    doc = nested.select(
        F.col("l_orderkey").alias("order_id"),
        F.struct(
            F.element_at("positions", 1)["l_quantity"].alias("qty"),
            F.size("positions").cast("long").alias("n"),
        ).alias("head"),
        F.to_json(
            F.struct(
                F.col("l_orderkey").alias("order_id"),
                F.size("positions").cast("long").alias("n"),
            )
        ).alias("custom_fields"),
    )
    return flatten_structs(doc, sep="_")


# ---------------------------------------------------------------------------
# Scalar-function batteries (SURVEY F1-F19, §2.9)
# ---------------------------------------------------------------------------


@register(
    "f_string_clean_coerce",
    oracle="""
SELECT c_custkey,
       regexp_replace(c_name, '[0-9]+', '#', 'g') AS name_masked,
       concat_ws(' ', c_name, c_mktsegment) AS display,
       CASE WHEN UPPER(c_mktsegment) = 'BUILDING' THEN 'B' ELSE 'O' END AS seg_flag,
       CAST(trunc(c_acctbal) AS BIGINT) AS bal_int,
       COALESCE(TRY_CAST(c_mktsegment AS DOUBLE), -1.0) AS seg_as_num,
       CASE WHEN c_mktsegment = 'n.a.' THEN NULL ELSE c_mktsegment END AS seg_clean,
       round(TRY_CAST(regexp_replace(CAST(c_nationkey AS VARCHAR) || '.5%', '%$', '', 'g') AS DOUBLE) / 100, 3) AS pct_frac,
       CAST(regexp_replace(CAST(c_custkey AS VARCHAR) || ',500', ',', '', 'g') AS BIGINT) AS thousands_stripped
FROM customer
""",
)
def f_string_clean_coerce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F3/F7/F8/F16/F17/F18 battery: regex masking, concat_ws, upper-cmp
    conditional, truncating int cast (Spark's double→long cast truncates;
    DuckDB needs explicit trunc()), try_cast coerce-to-null, sentinel→NULL.
    Reference sites: bexio_invoice_and_line_items_de.py:106-124,167-171,
    281-286; biilwerk_customers.py:140; import_bi_dev_gross_margin.py:51;
    F4 percent-strip import_bi_dev_gross_margin.py:56-58; F5 thousands-strip
    import_bi_dev_ltv.py:55-59 (locale inputs synthesized per-row)."""
    from ..ops.clean import null_if_in, percent_to_fraction, strip_thousands

    (c,) = tables(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_replace("c_name", "[0-9]+", "#").alias("name_masked"),
        F.concat_ws(" ", "c_name", "c_mktsegment").alias("display"),
        F.when(F.upper("c_mktsegment") == "BUILDING", "B").otherwise("O").alias("seg_flag"),
        F.col("c_acctbal").cast("long").alias("bal_int"),
        F.coalesce(F.col("c_mktsegment").try_cast("double"), F.lit(-1.0)).alias("seg_as_num"),
        null_if_in("c_mktsegment", ["n.a."]).alias("seg_clean"),
        percent_to_fraction(
            F.concat(F.col("c_nationkey").cast("string"), F.lit(".5%"))
        ).alias("pct_frac"),
        strip_thousands(
            F.concat(F.col("c_custkey").cast("string"), F.lit(",500"))
        ).cast("long").alias("thousands_stripped"),
    )


@register(
    "f_date_functions",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT) AS order_year,
       CAST(month(o_orderdate) AS INT) AS order_month,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       strftime(o_orderdate, '%Y-%m') AS ym,
       CAST(o_orderdate AS DATE) + 30 AS due_date
FROM orders
""",
)
def f_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6/F13/F14/F15 date battery: extract, month truncation, month-end
    (reference to_period('M') + MonthEnd(0), import_bi_dev_gross_margin.py:
    52-54), strftime rendering, day arithmetic."""
    (o,) = tables(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.last_day(F.to_date("o_orderdate")).alias("month_end"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.date_add(F.to_date("o_orderdate"), 30).alias("due_date"),
    )


@register(
    "f_timestamp_json",
    oracle="""
SELECT event_id,
       epoch_us(ts) AS unix_micros,
       CAST(floor(epoch_us(ts) / 1000000) AS BIGINT) AS unix_seconds,
       make_timestamp(epoch_us(ts)) AS ts_roundtrip,
       CAST(hour(ts) AS INT) AS event_hour,
       CAST(props::JSON->>'k' AS INTEGER) AS prop_k,
       CASE WHEN CAST(props::JSON->>'k' AS INTEGER) > 50 THEN 'high' ELSE 'low' END AS k_band
FROM events
""",
)
def f_timestamp_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9/F10 epoch conversions (reference unix-microseconds parser,
    bexio_invoice_and_line_items_de.py:96-100; epoch-seconds,
    stripe/account.py:120): micros → timestamp round trip both ways.
    Plus JSON payload parsing with an explicit schema (the engine's
    schema-on-read path for API payloads — the reference json.loads()es
    everything driver-side; here from_json runs JVM-side inside codegen,
    and the schema contract is declared, SURVEY §1.3)."""
    (e,) = tables(spark, sf_dir, "events")
    parsed = e.select("event_id", "ts", F.from_json("props", "k int").alias("p"))
    return parsed.select(
        "event_id",
        F.unix_micros("ts").alias("unix_micros"),
        F.floor(F.unix_micros("ts") / 1_000_000).cast("long").alias("unix_seconds"),
        F.timestamp_micros(F.unix_micros("ts")).alias("ts_roundtrip"),
        F.hour("ts").alias("event_hour"),
        F.col("p.k").alias("prop_k"),
        F.when(F.col("p.k") > 50, "high").otherwise("low").alias("k_band"),
    )
