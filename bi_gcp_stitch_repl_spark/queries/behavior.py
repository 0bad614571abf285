"""Behavioral / product analytics over the event stream: funnels,
retention cohorts, rolling active users.

The reference is a BI replication platform feeding exactly this class of
warehouse query downstream (SURVEY.md §0); the engine supplies them as
first-class operators over the `events` table, each with a DuckDB oracle.

Scale shapes:

* funnel — per-stage `min(ts)` aggregations chained by strictly-later
  joins: 3 hash aggregations + 2 equi-joins on user_id, all sharing one
  partitioning (no per-event window, no cross-stage explosion);
* retention — first-touch cohort assignment (one agg) joined to the
  distinct (user, week) activity grid; output is cohort × offset counts,
  tiny regardless of input scale;
* active users — daily distinct grid, then a trailing-7-day range join
  against the ~O(days) day dimension, which Catalyst broadcasts: the
  fact side streams through map-side, never shuffling by range key.

Determinism: min()/count() only — no order-dependent aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import register, tables


@register(
    "x_funnel",
    oracle="""
WITH v AS (
  SELECT user_id, MIN(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(e.ts) AS t_click
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.t_view
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS t_purchase
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
  GROUP BY e.user_id
)
SELECT u.user_id, v.t_view, c.t_click, p.t_purchase,
       CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
                 WHEN c.user_id IS NOT NULL THEN 2
                 WHEN v.user_id IS NOT NULL THEN 1
                 ELSE 0 END AS INTEGER) AS stage
FROM (SELECT DISTINCT user_id FROM events) u
LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
""",
)
def x_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view→click→purchase funnel: each user's earliest view, the
    earliest click strictly after it, the earliest purchase strictly after
    that, and the stage reached. Three min-aggregations chained by
    strictly-later joins — every join and agg keys on user_id, so AQE
    reuses one hash partitioning end to end; nothing explodes per event
    pair. min(ts) makes every stage timestamp deterministic."""
    (e,) = tables(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    users = e.select("user_id").distinct()
    stage = (
        F.when(F.col("t_purchase").isNotNull(), 3)
        .when(F.col("t_click").isNotNull(), 2)
        .when(F.col("t_view").isNotNull(), 1)
        .otherwise(0)
    )
    return (
        users.join(v, "user_id", "left")
        .join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "t_view",
            "t_click",
            "t_purchase",
            stage.cast("int").alias("stage"),
        )
    )


@register(
    "x_retention_cohorts",
    oracle="""
WITH first_touch AS (
  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY user_id
), activity AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS act_week
  FROM events
)
SELECT f.cohort_week,
       CAST((a.act_week - f.cohort_week) / 7 AS INTEGER) AS week_offset,
       COUNT(DISTINCT a.user_id) AS n_active
FROM activity a JOIN first_touch f USING (user_id)
GROUP BY 1, 2
""",
)
def x_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle: users cohorted by first-event week,
    counted distinct per (cohort, weeks-since-cohort). One agg for the
    cohort map, one distinct for the activity grid, one join on user_id,
    one final count — output is cohort×offset regardless of event volume,
    so this runs identically at 100 TB."""
    (e,) = tables(spark, sf_dir, "events")
    first_touch = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = e.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("act_week")
    ).distinct()
    return (
        activity.join(first_touch, "user_id")
        .groupBy(
            "cohort_week",
            F.floor(F.datediff("act_week", "cohort_week") / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


SESSION_GAP_SEC = 1800


@register(
    "x_session_gaps",
    oracle=f"""
WITH g AS (
  SELECT event_id, user_id, ts,
         (epoch_us(ts) - LAG(epoch_us(ts)) OVER w) / 1000000.0 AS gap_sec,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR (epoch_us(ts) - LAG(epoch_us(ts)) OVER w)
                      > {SESSION_GAP_SEC} * 1000000 THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_id, user_id, ts, gap_sec,
       new_s = 1 AS is_new_session,
       CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
FROM g
""",
)
def x_session_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-based sessionization: per-user gap to the previous event, session
    boundary at >{SESSION_GAP_SEC}s idle, and a running session number via
    cumulative sum of boundaries — the two-window idiom every clickstream
    warehouse runs. Both windows share one partitioning (user_id) and one
    sort, so the whole thing is a single shuffle + single sort per user.
    Complements st_session_windows (the session_window() operator form) with
    the explicit lag+cumsum form that also yields gap diagnostics."""
    from pyspark.sql import Window

    (e,) = tables(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_us = F.lag(F.unix_micros("ts")).over(w)
    gap_us = F.unix_micros("ts") - prev_us
    new_s = F.when(
        prev_us.isNull() | (gap_us > SESSION_GAP_SEC * 1_000_000), 1
    ).otherwise(0)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return e.select(
        "event_id",
        "user_id",
        "ts",
        (gap_us / 1_000_000.0).alias("gap_sec"),
        (new_s == 1).alias("is_new_session"),
        F.sum(new_s).over(wsum).cast("long").alias("session_seq"),
    )


def _dau_with_rolling(e, horizon_days: int, rolling_name: str):
    """(day, dau, <rolling_name>) — shared kernel of x_active_users /
    x_dau_mau_stickiness: one event-scale dedupe to the (user, day)
    grid, exact per-day distinct, and the explode-based rolling distinct
    over ``horizon_days``. ``dau``'s keyset IS the observed-day set, so
    the inner join with the rolling aggregate both aligns the keys and
    trims the explode's overhang past each activity day — no separate
    day-dimension distinct or extra join."""
    daily = e.select(F.col("ts").cast("date").alias("day"), "user_id").distinct()
    dau = daily.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    covered = daily.select(
        F.explode(
            F.expr(f"sequence(day, date_add(day, {horizon_days - 1}))")
        ).alias("day"),
        "user_id",
    )
    rolling = covered.groupBy("day").agg(
        F.countDistinct("user_id").alias(rolling_name)
    )
    return dau.join(rolling, "day")


@register(
    "x_active_users",
    oracle="""
WITH daily AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
), days AS (
  SELECT DISTINCT day FROM daily
)
SELECT d.day,
       (SELECT COUNT(DISTINCT a.user_id) FROM daily a WHERE a.day = d.day) AS dau,
       (SELECT COUNT(DISTINCT a.user_id) FROM daily a
         WHERE a.day BETWEEN d.day - 6 AND d.day) AS wau_trailing7
FROM days d
""",
)
def x_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU + trailing-7-day WAU per day. The (user, day) distinct grid is
    the only event-scale pass. A window can't express rolling COUNT
    DISTINCT; the scalable idiom is to EXPLODE each activity day into the
    7 report days it covers (a fixed 7× map-side fan-out, whole-stage
    codegen) and hash-aggregate the distinct on (day, user) — cost is
    7×|grid| rows shuffled on an equi key, independent of the calendar
    length. The range-join formulation (grid × day dimension) plans a
    BroadcastNestedLoopJoin whose per-row cost grows with |days| — fine
    for one month, quadratic creep over years of history. The final inner
    join between dau (whose keyset IS the observed-day set) and the
    rolling aggregate trims the explode's 6-day overhang past each
    activity day — shared kernel ``_dau_with_rolling``."""
    (e,) = tables(spark, sf_dir, "events")
    return _dau_with_rolling(e, 7, "wau_trailing7").select(
        "day", "dau", "wau_trailing7"
    )


@register(
    "x_dau_mau_stickiness",
    oracle="""
WITH daily AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
), days AS (
  SELECT DISTINCT day FROM daily
)
SELECT d.day,
       (SELECT COUNT(DISTINCT a.user_id) FROM daily a
         WHERE a.day = d.day) AS dau,
       (SELECT COUNT(DISTINCT a.user_id) FROM daily a
         WHERE a.day BETWEEN d.day - 29 AND d.day) AS mau_trailing30,
       CAST((SELECT COUNT(DISTINCT a.user_id) FROM daily a
              WHERE a.day = d.day) AS DOUBLE)
         / (SELECT COUNT(DISTINCT a.user_id) FROM daily a
             WHERE a.day BETWEEN d.day - 29 AND d.day) AS stickiness
FROM days d
""",
)
def x_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per day (the product-health north-star ratio).
    Same scalable idiom as x_active_users, at the monthly horizon: the
    event-scale work is ONE dedupe to the (user, day) grid; the rolling
    30-day distinct then explodes each user-day into the 30 report days
    it covers — 30×|grid| rows (user-DAYS, already deduped — never 30×
    raw events) hash-aggregated on an equi key, calendar-length
    independent. Exact integer counts; the ratio is one IEEE division."""
    (e,) = tables(spark, sf_dir, "events")
    return (
        _dau_with_rolling(e, 30, "mau_trailing30")
        .select(
            "day",
            "dau",
            "mau_trailing30",
            (F.col("dau").cast("double") / F.col("mau_trailing30")).alias(
                "stickiness"
            ),
        )
    )


ATTR_WINDOW_SEC = 3600  # clicks within this window before a purchase share credit
ATTR_WINDOW_US = ATTR_WINDOW_SEC * 1_000_000


@register(
    "x_linear_attribution",
    oracle=f"""
WITH ev AS (
  SELECT event_id, user_id, ts, event_type, epoch_us(ts) AS es FROM events
  WHERE event_type IN ('click', 'purchase')
)
SELECT c.event_id, c.user_id, c.ts,
       CAST((SELECT COUNT(*) FROM ev p
              WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
                AND p.es > c.es AND p.es <= c.es + {ATTR_WINDOW_US})
            AS BIGINT) AS n_conversions,
       COALESCE((SELECT CAST(SUM(CAST(floor(1000000000000.0 / t.n_touch) AS BIGINT)) AS DOUBLE)
                        / 1000000000000.0 FROM (
           SELECT p.es,
                  (SELECT COUNT(*) FROM ev c2
                    WHERE c2.user_id = p.user_id AND c2.event_type = 'click'
                      AND c2.es < p.es AND c2.es >= p.es - {ATTR_WINDOW_US})
                    AS n_touch
           FROM ev p
           WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
             AND p.es > c.es AND p.es <= c.es + {ATTR_WINDOW_US}) t
          WHERE t.n_touch > 0), 0.0) AS credit
FROM ev c WHERE c.event_type = 'click'
""",
)
def x_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch LINEAR attribution: every click within the hour before
    a purchase shares that conversion's credit equally (credit = Σ over
    attributed conversions of 1/n_touches; a click can serve several
    conversions). The scalable plan is TWO RANGE-frame window passes over
    ONE shuffle on user_id — no click×purchase join, no range-join
    explosion:

    1. backward pass: each purchase counts its preceding-hour clicks
       (n_touch) via a [-W, -1ns) RANGE frame over the click indicator;
    2. forward pass: each click sums 1/n_touch over purchases in its
       following hour via a (now, +W] RANGE frame.

    The oracle is the textbook doubly-correlated form — O(|events|²) per
    user — that these two frames replace. Credit shares are FIXED-POINT
    picoshares (floor(1e12/n_touch)) summed as BIGINT, so the frame sum
    is order-insensitive — a RANGE frame can't carry a (ts, event_id)
    total order, and same-microsecond peers would otherwise make an IEEE
    double sum ulp-unstable. Events outside {{click, purchase}} are
    filtered at the scan."""
    from pyspark.sql import Window

    (e,) = tables(spark, sf_dir, "events")
    ev = e.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_id", "user_id", "ts", "event_type",
        F.unix_micros("ts").alias("es"),
    )
    w_back = (
        Window.partitionBy("user_id")
        .orderBy("es")
        .rangeBetween(-ATTR_WINDOW_SEC * 1_000_000, Window.currentRow)
    )
    is_click = (F.col("event_type") == "click").cast("long")
    # frame includes the current row; purchases are not clicks so the
    # indicator sum over [-W, 0] equals the strict (-W, now) click count
    # ONLY if no click shares the purchase's exact timestamp — subtract
    # same-instant clicks explicitly to honor the strict < bound. The
    # peer count comes from a RANGE(0, 0) frame on the SAME (user_id, es)
    # window spec as w_back — a Window.partitionBy(user_id, es) spelling
    # would plan a SECOND full exchange of the event set and break the
    # one-shuffle contract; the zero-width range frame reuses w_back's
    # exchange and sort.
    same_instant_clicks = F.sum(is_click).over(
        Window.partitionBy("user_id").orderBy("es").rangeBetween(0, 0)
    ) * (F.col("event_type") == "purchase").cast("long")
    stage1 = ev.withColumn(
        "n_touch",
        F.when(
            F.col("event_type") == "purchase",
            F.sum(is_click).over(w_back) - same_instant_clicks,
        ),
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy("es")
        .rangeBetween(1, ATTR_WINDOW_SEC * 1_000_000)  # strictly after, within W
    )
    # FIXED-POINT credit share (picoshares: floor(1e12 / n_touch), a pure
    # per-VALUE function), so the frame sum is exact BIGINT arithmetic —
    # order-INSENSITIVE. A double 1/n_touch summed by the RANGE frame
    # would accumulate in partition-sort order, and same-microsecond
    # peers have no defined relative order (a RANGE frame cannot carry a
    # (ts, event_id) total order), so ties would make the IEEE sum
    # ulp-unstable across runs. Overflow headroom: ≤ ~1e6 conversions
    # per frame × 1e12 ≪ 2^63.
    conv_share_fp = F.when(
        (F.col("event_type") == "purchase") & (F.col("n_touch") > 0),
        F.floor(F.lit(1_000_000_000_000.0) / F.col("n_touch")),
    )
    conv_flag = (F.col("event_type") == "purchase").cast("long")
    stage2 = stage1.withColumn(
        "credit",
        F.coalesce(F.sum(conv_share_fp).over(w_fwd), F.lit(0)).cast("double")
        / F.lit(1_000_000_000_000.0),
    ).withColumn(
        "n_conversions", F.coalesce(F.sum(conv_flag).over(w_fwd), F.lit(0))
    )
    return stage2.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "n_conversions", "credit"
    )
