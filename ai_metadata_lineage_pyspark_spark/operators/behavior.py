"""Behavioral analytics over the `events` stream: cohort retention and
sliding-window activity — the two product-analytics shapes (Amplitude/
Mixpanel-class) not yet covered by the funnel/sessionization operators.

* `user_retention_cohorts` — classic triangular retention: users are
  cohorted by the ISO week of their first event; each later active week
  increments that cohort's (week_offset) cell. The plan is two aggregations
  sharing the user_id shuffle key (distinct weeks -> min week) plus one
  co-partitioned self-join — at 100 TB both aggs partial-combine map-side
  and the join never re-shuffles the bigger side, because Spark reuses the
  user_id hash partitioning from the distinct. The cohort-size dimension is
  weeks-count sized (tiny) and broadcasts.
* `sliding_window_counts` — hopping-window activity (2h window, 1h hop):
  the batch twin of Structured Streaming's `window(ts, w, s)` slide form
  (streaming/sessions.py covers tumbling + session); each event lands in
  exactly width/hop windows, so the explode factor is a constant 2 — the
  shuffle carries (window, event_type) keys with map-side combine, which is
  scan-dominated at any corpus size.

Both query shapes produce exact-integer outputs (counts; the one ratio is a
single division of two exact BIGINTs, bit-identical across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.io import load, load_events
from ..registry import register


@register(
    "user_retention_cohorts",
    oracle="""
    WITH wu AS (
      SELECT DISTINCT user_id,
        CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS wk
      FROM events
    ),
    c AS (SELECT user_id, MIN(wk) AS cohort_week FROM wu GROUP BY user_id),
    sz AS (SELECT cohort_week, COUNT(*) AS cohort_size FROM c GROUP BY cohort_week),
    act AS (
      SELECT c.cohort_week,
        CAST(date_diff('day', c.cohort_week, wu.wk) // 7 AS BIGINT) AS week_offset,
        COUNT(*) AS n_active
      FROM wu JOIN c USING (user_id)
      GROUP BY 1, 2
    )
    SELECT act.cohort_week, act.week_offset, act.n_active,
      sz.cohort_size,
      CAST(act.n_active AS DOUBLE) / sz.cohort_size AS retention_rate
    FROM act JOIN sz USING (cohort_week)
    """,
)
def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix. Monday-based ISO weeks (Spark
    date_trunc('week') and DuckDB date_trunc('week') agree); week_offset is
    whole weeks since the cohort week, so offset 0 rows give cohort size
    and retention_rate 1.0."""
    wu = (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            F.date_trunc("week", F.col("ts")).cast("date").alias("wk"),
        )
        .distinct()
    )
    cohort = wu.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    sz = cohort.groupBy("cohort_week").agg(F.count(F.lit(1)).alias("cohort_size"))
    act = (
        wu.join(cohort, "user_id")
        .select(
            "cohort_week",
            (F.datediff(F.col("wk"), F.col("cohort_week")) / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return act.join(F.broadcast(sz), "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_active",
        "cohort_size",
        (F.col("n_active").cast("double") / F.col("cohort_size")).alias(
            "retention_rate"
        ),
    )


@register(
    "sliding_window_counts",
    oracle="""
    WITH x AS (
      SELECT
        date_trunc('hour', CAST(ts AS TIMESTAMP))
          - unnest([0, 1]) * INTERVAL 1 HOUR AS win_start,
        event_type, user_id
      FROM events
    )
    SELECT win_start, event_type,
      COUNT(*) AS n_events,
      COUNT(DISTINCT user_id) AS n_users
    FROM x
    GROUP BY 1, 2
    """,
)
def sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping-window event counts: 2-hour windows advancing hourly, so
    every event contributes to exactly 2 windows (epoch-aligned, matching
    the oracle's hour-truncate minus {0,1} hours)."""
    e = load(spark, sf_dir, "events").select("ts", "event_type", "user_id")
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n_events",
            "n_users",
        )
    )


# ---------------------------------------------------------------------------
# event_transition_matrix — first-order Markov transition counts over each
# user's time-ordered event stream: the behavioral-analytics statistic
# behind next-action prediction, funnel design, and bot detection.
# ---------------------------------------------------------------------------


_TRANSITION_ORACLE = """
    WITH ordered AS (
      SELECT user_id, event_type,
        LAG(event_type) OVER (PARTITION BY user_id
                              ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id)
          AS prev_type
      FROM events
    ),
    trans AS (
      SELECT prev_type, event_type AS next_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM ordered WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    )
    SELECT prev_type, next_type, n,
      CAST(n * 1000000 // SUM(n) OVER (PARTITION BY prev_type) AS BIGINT)
        AS prob_ppm
    FROM trans
"""


@register("event_transition_matrix", oracle=_TRANSITION_ORACLE)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(prev event → next event) counts and integer-ppm transition
    probabilities per source state, from each user's time-ordered stream
    (ties broken by event_id, matching the oracle exactly).

    Scale shape: ONE user-keyed shuffle for the lag window (the same
    partitioning every per-user operator in this engine reuses), then a
    transition-keyed rollup whose cardinality is |event_types|² —
    constant, so the second shuffle carries a handful of rows regardless
    of corpus size. The ppm normalization windows over that constant-size
    table, never the fact table."""
    from pyspark.sql import Window as W

    ev = load_events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    ordered = ev.select(
        "user_id", "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    trans = (
        ordered.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return trans.select(
        "prev_type",
        "next_type",
        "n",
        F.expr("CAST(n * 1000000 DIV SUM(n) OVER (PARTITION BY prev_type) AS BIGINT)").alias(
            "prob_ppm"
        ),
    )


# ---------------------------------------------------------------------------
# customer_ltv_cohorts — acquisition-cohort lifetime value over orders:
# customers grouped by first-order quarter, revenue accumulated by quarters
# since acquisition. The revenue-side complement of the event-side
# user_retention_cohorts.
# ---------------------------------------------------------------------------


@register(
    "customer_ltv_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey,
        MIN(date_trunc('quarter', CAST(o_orderdate AS DATE))) AS cohort_q
      FROM orders GROUP BY o_custkey
    ),
    placed AS (
      SELECT f.cohort_q,
        datediff('quarter', f.cohort_q,
                 date_trunc('quarter', CAST(o.o_orderdate AS DATE))) AS q_since,
        CAST(floor(o.o_totalprice) AS BIGINT) AS usd
      FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
    )
    SELECT CAST(cohort_q AS DATE) AS cohort_q, CAST(q_since AS BIGINT) AS q_since,
      CAST(COUNT(*) AS BIGINT) AS n_orders,
      CAST(SUM(usd) AS BIGINT) AS revenue_usd
    FROM placed
    GROUP BY cohort_q, q_since
    """,
)
def customer_ltv_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV triangle: (acquisition quarter, quarters since
    acquisition) -> order count + exact integer dollar revenue.

    Scale shape: the first-order table is a customer-keyed partial-agg
    rollup; joining it back to orders is the same customer-keyed
    partitioning, so AQE plans one co-partitioned exchange pair; the final
    rollup's cardinality is quarters² — constant. Dollar sums are
    floor-to-BIGINT (order-independent); quarter arithmetic matches
    DuckDB's date_trunc/datediff('quarter') exactly via month math."""
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr("CAST(date_trunc('quarter', CAST(o_orderdate AS DATE)) AS DATE)").alias("oq"),
        F.expr("CAST(floor(o_totalprice) AS BIGINT)").alias("usd"),
    )
    firsts = orders.groupBy("o_custkey").agg(F.min("oq").alias("cohort_q"))
    placed = orders.join(firsts, "o_custkey").select(
        "cohort_q",
        F.expr(
            "CAST((year(oq) - year(cohort_q)) * 4 + (quarter(oq) - quarter(cohort_q)) AS BIGINT)"
        ).alias("q_since"),
        "usd",
    )
    return placed.groupBy("cohort_q", "q_since").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("usd").alias("revenue_usd"),
    )
