"""Window-function and time-window queries.

The reference has zero window functions (SURVEY.md §2.6 — verified: no
OVER(), rank, row_number anywhere); it emulates "latest per key" with
anti-join history capture. The Spark engine supplies windows natively and
uses them as the scalable re-expression of those patterns, plus the
time-window aggregations that back the Structured Streaming jobs in
``streaming/`` (each streaming job has a batch-equivalent here so the
semantics are oracle-checkable; the true streaming execution is covered by
pytest with Trigger.AvailableNow).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import register, tables
from .parity import _dsum, dec_sum


@register(
    "w_topk_per_group",
    oracle="""
SELECT o_orderstatus, o_orderkey, o_totalprice, CAST(rk AS INT) AS rk FROM (
  SELECT o_orderstatus, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders
) WHERE rk <= 3
""",
)
def w_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k rows per group, two-level: a SALTED pre-reduction window
    (top-3 per (status, hash-salt) over 64 salt lanes) collapses the
    table to ≤ 192 candidate rows per status, then the exact global
    window ranks that tiny survivor set. The naive single window over
    ``o_orderstatus`` funnels the WHOLE table into 3 unsplittable tasks
    (one per status value) — row_number needs every row of a key in one
    task, and AQE's skew splitting applies to joins, not windows, so at
    100 TB that plan stalls a single reducer no matter the cluster size.
    The salt is a pure function of the unique tiebreaker, so the result
    is deterministic and EXACTLY the single-window answer: every true
    global top-3 row is necessarily in its salt lane's top-3. Unique
    tiebreaker keeps ordering total (SURVEY §2.6)."""
    from ..ops.skew import salted_topk

    (o,) = tables(spark, sf_dir, "orders")
    src = o.select("o_orderstatus", "o_orderkey", "o_totalprice")
    return salted_topk(
        src,
        partition_by=["o_orderstatus"],
        order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey")],
        k=3,
        salt_on="o_orderkey",
    )


@register(
    "w_latest_per_key",
    oracle="""
SELECT user_id, event_id AS latest_event_id, event_type AS latest_event_type, ts AS latest_ts
FROM (
  SELECT user_id, event_id, event_type, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
""",
)
def w_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest row per key (ops.history.latest_per_key): the engine's native
    replacement for the reference's change-history emulation. Never
    max()+self-join — one shuffle, no second scan of the fact table."""
    (e,) = tables(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("latest_event_id"),
            F.col("event_type").alias("latest_event_type"),
            F.col("ts").alias("latest_ts"),
        )
    )


@register(
    "w_running_total",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,10)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_total
FROM orders
""",
)
def w_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer ordered by time — cumulative frame with the
    decimal-exact sum (frame accumulation order is defined, but decimal keeps
    it bit-stable against any engine's accumulation strategy)."""
    (o,) = tables(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(28,10)")).over(w).cast("double").alias("running_total"),
    )


@register(
    "st_tumbling_window",
    oracle=f"""
SELECT date_trunc('hour', ts) AS window_start, event_type,
       COUNT(*) AS n_events, {_dsum('value')} AS total_value
FROM events GROUP BY 1, 2
""",
)
def st_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window per event type — the batch-
    equivalent of streaming.jobs.tumbling_counts (readStream + watermark +
    window over the same table). F.window() start aligns with date_trunc for
    hour-width windows."""
    (e,) = tables(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), dec_sum("value", "total_value"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value"
        )
    )


@register(
    "st_session_windows",
    oracle="""
WITH ordered AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT user_id, ts, event_id,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS session_id
  FROM ordered
)
SELECT user_id, session_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events
FROM numbered GROUP BY user_id, session_id
""",
)
def st_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-minute inactivity gap (gaps-and-islands):
    the batch-equivalent of streaming session_window aggregation
    (streaming.jobs.session_counts). lag → new-session flag → cumulative
    sum → per-session rollup: two window passes over one shuffle on
    user_id, no self-join — the shape that survives 100 TB."""
    (e,) = tables(spark, sf_dir, "events")
    order = [F.col("ts"), F.col("event_id")]
    w = Window.partitionBy("user_id").orderBy(*order)
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # microsecond-precision gap: casting to whole seconds would truncate and
    # disagree with the oracle's INTERVAL comparison on sub-second gaps
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    flagged = e.select("user_id", "ts", "event_id").withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0),
    )
    numbered = flagged.withColumn("session_id", F.sum("new_session").over(wcum))
    return numbered.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
    )


@register(
    "w_ntile_quartiles",
    oracle="""
SELECT c_custkey, c_nationkey,
       CAST(NTILE(4) OVER (PARTITION BY c_nationkey
                           ORDER BY c_acctbal DESC, c_custkey) AS INTEGER)
         AS balance_quartile
FROM customer
""",
)
def w_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation account-balance quartiles via ntile — the banding window
    a BI layer uses for segment assignment. NTILE is deterministic only
    under a TOTAL order, so the tiebreak on c_custkey is load-bearing
    (equal balances would otherwise land in engine-dependent tiles).

    SCALE ENVELOPE: one shuffle on the partition key, and parallelism is
    CAPPED at the key cardinality (25 nations) — ntile needs its whole
    partition in one task and, unlike top-k, has no exact pre-reduction
    (every row's tile depends on the full partition's count). Right for
    dimension-bounded banding like this; for a quartile banding over a
    100 TB fact keyed by a few values, compute exact per-key cutoff
    ranks first (counts + percentile boundaries, a map-side-combinable
    aggregate) and band by comparison instead."""
    (c,) = tables(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.ntile(4).over(w).cast("int").alias("balance_quartile"),
    )


@register(
    "w_rolling_30d_revenue",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,10)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                  RANGE BETWEEN INTERVAL 29 DAY PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS rev_30d
FROM orders
""",
)
def w_rolling_30d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-30-day revenue per customer at every order: a RANGE frame
    (event-time width, peer-inclusive), not a ROWS frame — the frame is
    defined by the *time* bound, so same-day orders are always peers and
    row order inside a day cannot change the answer (ROWS would make it
    nondeterministic under ties). The DataFrame API expresses the
    interval bound as a rangeBetween over ``unix_date`` — EPOCH DAYS,
    which are timezone-free. ``unix_timestamp(DATE)`` with a ±29·86400
    seconds bound is the trap: it yields epoch seconds of LOCAL midnight
    in the session timezone, and around a DST transition two midnights
    sit 23 or 25 hours apart — an order exactly 29 days back falls
    outside the seconds window and silently drops from the rolling sum
    (invisible to the UTC-pinned oracle harness, fatal under a host-TZ
    session). One shuffle on the customer key, decimal-exact
    accumulation."""
    (o,) = tables(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        # the NTZ→date cast is timezone-free (it just truncates the
        # wall-clock value), so the whole ordering key never consults
        # the session timezone
        .orderBy(F.unix_date(F.col("o_orderdate").cast("date")))
        .rangeBetween(-29, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(28,10)"))
        .over(w)
        .cast("double")
        .alias("rev_30d"),
    )


@register(
    "w_frames_battery",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice,
       lag(o_totalprice, 1, 0.0) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey) AS prev_price,
       lead(o_totalprice, 1, 0.0) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey) AS next_price,
       first_value(o_orderkey) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey) AS first_order,
       last_value(o_orderkey) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           AS last_order,
       nth_value(o_orderkey, 2) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           AS second_order,
       percent_rank() OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey) AS pct_rank,
       cume_dist() OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey) AS cume
FROM orders
""",
)
def w_frames_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Navigation + distribution window-function battery: lag/lead with
    defaults, first_value on the default running frame, last_value and
    nth_value on the explicit full-partition frame (the default frame
    would make them degenerate), percent_rank and cume_dist. Pins the
    exact frame semantics against DuckDB so every function is safe to
    recommend downstream. All eight share ONE window ordering —
    a single shuffle + sort on o_custkey serves the whole battery, and
    (o_orderdate, o_orderkey) is a total order per partition so each
    output is deterministic."""
    o, = tables(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice", 1, 0.0).over(w).alias("prev_price"),
        F.lead("o_totalprice", 1, 0.0).over(w).alias("next_price"),
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(wfull).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(wfull).alias("second_order"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@register(
    "st_time_rollup",
    oracle="""
SELECT CAST(EXTRACT(year FROM ts) AS BIGINT) AS y,
       CAST(EXTRACT(month FROM ts) AS BIGINT) AS m,
       CAST(EXTRACT(day FROM ts) AS BIGINT) AS d,
       CAST(GROUPING(EXTRACT(month FROM ts)) * 2
            + GROUPING(EXTRACT(day FROM ts)) AS BIGINT) AS lvl,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY ROLLUP (EXTRACT(year FROM ts), EXTRACT(month FROM ts),
                 EXTRACT(day FROM ts))
HAVING GROUPING(EXTRACT(year FROM ts)) = 0
""",
)
def st_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: event counts and value sums
    at day, month, and year granularity in ONE pass — GROUP BY ROLLUP
    over the extracted calendar hierarchy (grouping-id disambiguates the
    levels; the grand-total row is cut because a time-series rollup
    serves per-bucket reads, not a corpus total). Spark expands each row
    into its 3 hierarchy levels BEFORE the shuffle and partially
    aggregates map-side, so the exchange carries at most 3× the
    day-level aggregate — never 3× the events. The decimal value sum
    keeps every level partition-order exact. This is the batch shape of
    a streaming windowed rollup: the same day-level aggregate is what a
    watermarked tumbling window emits incrementally."""
    (e,) = tables(spark, sf_dir, "events")
    y, m, d = F.year("ts"), F.month("ts"), F.dayofmonth("ts")
    return (
        e.select(
            y.cast("long").alias("y"),
            m.cast("long").alias("m"),
            d.cast("long").alias("d"),
            F.col("value"),
        )
        .rollup("y", "m", "d")
        .agg(
            (F.grouping("m") * 2 + F.grouping("d")).cast("long").alias("lvl"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias(
                "total_value"
            ),
        )
        .filter(F.grouping("y") == 0)
        .select("y", "m", "d", "lvl", "n_events", "total_value")
    )
