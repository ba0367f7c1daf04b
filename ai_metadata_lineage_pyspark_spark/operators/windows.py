"""Window-function operator surface: dedup-by-latest, ranking tiers,
lag/lead/rolling frames, percent_rank bucketing, gap-based sessionization.

Reference semantics: script_02 (row_number latest-per-key), script_03
(lag/lead + rowsBetween rolling sums), script_05 (rank/dense_rank + top-N
flag), script_06 (gap sessionization), script_07 (scoring + percent_rank
buckets). All window orderings carry a unique tiebreaker column so results
are deterministic across engines.

Scale notes: every window here partitions by a high-cardinality key
(user_id / o_custkey / order_date), so state per partition stays small and
the shuffle is a single hash exchange that AQE can coalesce; no global sorts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.io import load
from ..registry import register

# ---------------------------------------------------------------------------
# latest_event_per_user — script_02_dim_customer_latest.py:8-22: row_number
# over (key, ts desc) + rn==1 filter + drop + when/otherwise tiering +
# regexp_extract. Tiebreak on event_id keeps row choice deterministic.
# ---------------------------------------------------------------------------


@register(
    "latest_event_per_user",
    oracle="""
    WITH ranked AS (
      SELECT
        event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value, props,
        ROW_NUMBER()  OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn,
        RANK()        OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rnk,
        DENSE_RANK()  OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS drnk
      FROM events
    )
    SELECT
      event_id, user_id, ts, event_type, value, props, rnk, drnk,
      CASE WHEN value >= 15 THEN 'platinum'
           WHEN value >= 10 THEN 'gold'
           WHEN value >= 5  THEN 'silver'
           ELSE 'bronze' END AS user_tier,
      REGEXP_EXTRACT(props, '"k": (\\d+)', 1) AS props_k
    FROM ranked
    WHERE rn = 1
    """,
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        events.withColumn("rn", F.row_number().over(w))
        .withColumn("rnk", F.rank().over(w))
        .withColumn("drnk", F.dense_rank().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "ts_us")
        .withColumn(
            "user_tier",
            F.when(F.col("value") >= 15, "platinum")
            .when(F.col("value") >= 10, "gold")
            .when(F.col("value") >= 5, "silver")
            .otherwise("bronze"),
        )
        .withColumn("props_k", F.regexp_extract(F.col("props"), r'"k": (\d+)', 1))
    )


# ---------------------------------------------------------------------------
# orders_lag_lead_rolling — script_03_fact_orders_enriched.py:22-33: lag /
# lead / delta-vs-prev / rowsBetween(-6,0) and (-29,0) rolling sums per
# customer ordered by (order_date, order_id).
# ---------------------------------------------------------------------------


@register(
    "orders_lag_lead_rolling",
    oracle="""
    SELECT
      o_orderkey AS order_id,
      o_custkey  AS customer_id,
      CAST(o_orderdate AS DATE) AS order_date,
      o_totalprice AS amount,
      LAG(o_totalprice, 1)  OVER w AS prev_amount,
      LEAD(o_totalprice, 1) OVER w AS next_amount,
      ROUND(o_totalprice - COALESCE(LAG(o_totalprice, 1) OVER w, 0.0), 2) AS amount_delta_prev,
      ROUND(SUM(o_totalprice) OVER (w ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 2)  AS rolling_7_orders_sum,
      ROUND(SUM(o_totalprice) OVER (w ROWS BETWEEN 29 PRECEDING AND CURRENT ROW), 2) AS rolling_30_orders_sum
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
    """,
)
def orders_lag_lead_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
    return orders.select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_custkey").alias("customer_id"),
        F.to_date("o_orderdate").alias("order_date"),
        F.col("o_totalprice").alias("amount"),
        F.lag("o_totalprice", 1).over(w).alias("prev_amount"),
        F.lead("o_totalprice", 1).over(w).alias("next_amount"),
        F.round(
            F.col("o_totalprice") - F.coalesce(F.lag("o_totalprice", 1).over(w), F.lit(0.0)), 2
        ).alias("amount_delta_prev"),
        F.round(F.sum("o_totalprice").over(w.rowsBetween(-6, 0)), 2).alias("rolling_7_orders_sum"),
        F.round(F.sum("o_totalprice").over(w.rowsBetween(-29, 0)), 2).alias(
            "rolling_30_orders_sum"
        ),
    )


# ---------------------------------------------------------------------------
# web_sessionization — script_06_web_sessionization.py:13-38: lag -> gap ->
# new-session flag -> running sum session number -> concat_ws session id ->
# GROUP BY session with MIN/MAX/COUNT/COUNT DISTINCT. Gap arithmetic runs on
# integer epoch-microseconds so both engines agree bit-for-bit.
# ---------------------------------------------------------------------------

_SESSION_GAP_US = 30 * 60 * 1_000_000


@register(
    "web_sessionization",
    bench=True,
    oracle=f"""
    WITH evts AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
             epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_type
      FROM events
    ),
    flagged AS (
      SELECT *,
        CASE WHEN LAG(ts_us) OVER w IS NULL
                  OR ts_us - LAG(ts_us) OVER w > {_SESSION_GAP_US}
             THEN 1 ELSE 0 END AS new_session_flag
      FROM evts
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC)
    ),
    numbered AS (
      SELECT *,
        SUM(new_session_flag) OVER (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC) AS session_num
      FROM flagged
    ),
    sessions AS (
      SELECT *,
        CAST(user_id AS VARCHAR) || '-' || CAST(CAST(ts AS DATE) AS VARCHAR)
          || '-' || CAST(session_num AS VARCHAR) AS session_id
      FROM numbered
    )
    SELECT
      user_id, session_id,
      MIN(ts) AS session_start_ts,
      MAX(ts) AS session_end_ts,
      COUNT(1) AS events,
      COUNT(DISTINCT event_type) AS unique_event_types
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def web_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts_us").asc(), F.col("event_id").asc())
    sessions = (
        events.withColumn("prev_us", F.lag("ts_us").over(w))
        .withColumn(
            "new_session_flag",
            F.when(
                F.col("prev_us").isNull()
                | ((F.col("ts_us") - F.col("prev_us")) > F.lit(_SESSION_GAP_US)),
                1,
            ).otherwise(0),
        )
        .withColumn("session_num", F.sum("new_session_flag").over(w))
        .withColumn(
            "session_id",
            F.concat_ws(
                "-",
                F.col("user_id").cast("string"),
                F.to_date("ts").cast("string"),
                F.col("session_num").cast("string"),
            ),
        )
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start_ts"),
        F.max("ts").alias("session_end_ts"),
        F.count(F.lit(1)).alias("events"),
        F.countDistinct("event_type").alias("unique_event_types"),
    )


# ---------------------------------------------------------------------------
# sales_margin_rank — script_05_sales_margin_rank.py:8-29: inner + left
# multi-join, derived cost/margin columns with coalesce defaults and guarded
# division, rank/dense_rank within day, top-10 flag. part is broadcast.
# All derived doubles come from the same IEEE mul/sub/div chain in both
# engines, so they are bit-identical and need no rounding.
# ---------------------------------------------------------------------------


@register(
    "sales_margin_rank",
    oracle="""
    WITH enriched AS (
      SELECT
        l.l_orderkey, l.l_linenumber,
        CAST(o.o_orderdate AS DATE) AS order_date,
        l.l_extendedprice * (1 - l.l_discount) AS gross_sales,
        l.l_quantity * COALESCE(p.p_retailprice, 0.0) * 0.6 AS est_cost
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      LEFT JOIN part p ON l.l_partkey = p.p_partkey
    ),
    m AS (
      SELECT *, gross_sales - est_cost AS est_margin FROM enriched
    ),
    ranked AS (
      SELECT *,
        RANK()       OVER (PARTITION BY order_date ORDER BY est_margin DESC) AS margin_rank_day,
        DENSE_RANK() OVER (PARTITION BY order_date ORDER BY est_margin DESC) AS margin_dense_rank_day
      FROM m
    )
    SELECT
      l_orderkey, l_linenumber, order_date,
      gross_sales, est_cost, est_margin,
      CASE WHEN gross_sales = 0 THEN NULL ELSE est_margin / gross_sales END AS est_margin_pct,
      margin_rank_day, margin_dense_rank_day,
      CASE WHEN margin_rank_day <= 10 THEN 1 ELSE 0 END AS top_10_flag
    FROM ranked
    """,
    bench=True,
)
def sales_margin_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").alias("l")
    orders = load(spark, sf_dir, "orders").alias("o")
    part = F.broadcast(load(spark, sf_dir, "part").alias("p"))
    gross = F.col("l.l_extendedprice") * (F.lit(1) - F.col("l.l_discount"))
    est_cost = F.col("l.l_quantity") * F.coalesce(F.col("p.p_retailprice"), F.lit(0.0)) * F.lit(0.6)
    df = (
        li.join(orders, F.col("l.l_orderkey") == F.col("o.o_orderkey"), "inner")
        .join(part, F.col("l.l_partkey") == F.col("p.p_partkey"), "left")
        .select(
            F.col("l.l_orderkey").alias("l_orderkey"),
            F.col("l.l_linenumber").alias("l_linenumber"),
            F.to_date("o.o_orderdate").alias("order_date"),
            gross.alias("gross_sales"),
            est_cost.alias("est_cost"),
        )
        .withColumn("est_margin", F.col("gross_sales") - F.col("est_cost"))
    )
    w = Window.partitionBy("order_date").orderBy(F.col("est_margin").desc())
    return (
        df.withColumn("margin_rank_day", F.rank().over(w))
        .withColumn("margin_dense_rank_day", F.dense_rank().over(w))
        .select(
            "l_orderkey",
            "l_linenumber",
            "order_date",
            "gross_sales",
            "est_cost",
            "est_margin",
            F.when(F.col("gross_sales") == 0, F.lit(None))
            .otherwise(F.col("est_margin") / F.col("gross_sales"))
            .alias("est_margin_pct"),
            "margin_rank_day",
            "margin_dense_rank_day",
            F.when(F.col("margin_rank_day") <= 10, 1).otherwise(0).alias("top_10_flag"),
        )
    )


# ---------------------------------------------------------------------------
# fraud_scoring — script_07_fraud_scoring.py:8-34: isin / multi-branch when
# scoring summed into raw_risk_score, percent_rank within day (desc score,
# desc amount), threshold bucketing. percent_rank = (rank-1)/(n-1) is exact
# integer-ratio arithmetic -> identical across engines.
# ---------------------------------------------------------------------------


@register(
    "fraud_scoring",
    oracle="""
    WITH scored AS (
      SELECT
        o_orderkey AS order_id,
        CAST(o_orderdate AS DATE) AS order_date,
        o_totalprice AS amount,
        CASE WHEN o_totalprice >= 200000 THEN 1 ELSE 0 END AS high_value_flag,
        CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 2
             WHEN o_orderpriority = '3-MEDIUM' THEN 1
             ELSE 0 END AS risk_from_priority,
        CASE WHEN o_orderstatus = 'F' THEN 3 ELSE 0 END AS risk_from_status
      FROM orders
    ),
    summed AS (
      SELECT *, high_value_flag + risk_from_priority + risk_from_status AS raw_risk_score
      FROM scored
    ),
    ranked AS (
      SELECT *,
        RANK() OVER w AS risk_rank_day,
        PERCENT_RANK() OVER w AS pr
      FROM summed
      WINDOW w AS (PARTITION BY order_date ORDER BY raw_risk_score DESC, amount DESC)
    )
    SELECT
      order_id, order_date, amount, high_value_flag, risk_from_priority,
      risk_from_status, raw_risk_score, risk_rank_day,
      ROUND(pr, 6) AS risk_percent_rank_day,
      CASE WHEN pr >= 0.99 THEN 'critical'
           WHEN pr >= 0.95 THEN 'high'
           WHEN pr >= 0.80 THEN 'medium'
           ELSE 'low' END AS risk_bucket
    FROM ranked
    """,
)
def fraud_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    scored = orders.select(
        F.col("o_orderkey").alias("order_id"),
        F.to_date("o_orderdate").alias("order_date"),
        F.col("o_totalprice").alias("amount"),
        F.when(F.col("o_totalprice") >= 200000, 1).otherwise(0).alias("high_value_flag"),
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 2)
        .when(F.col("o_orderpriority") == "3-MEDIUM", 1)
        .otherwise(0)
        .alias("risk_from_priority"),
        F.when(F.col("o_orderstatus") == "F", 3).otherwise(0).alias("risk_from_status"),
    ).withColumn(
        "raw_risk_score",
        F.col("high_value_flag") + F.col("risk_from_priority") + F.col("risk_from_status"),
    )
    w = Window.partitionBy("order_date").orderBy(
        F.col("raw_risk_score").desc(), F.col("amount").desc()
    )
    return (
        scored.withColumn("risk_rank_day", F.rank().over(w))
        .withColumn("pr", F.percent_rank().over(w))
        .withColumn("risk_percent_rank_day", F.round(F.col("pr"), 6))
        .withColumn(
            "risk_bucket",
            F.when(F.col("pr") >= 0.99, "critical")
            .when(F.col("pr") >= 0.95, "high")
            .when(F.col("pr") >= 0.80, "medium")
            .otherwise("low"),
        )
        .drop("pr")
    )


# ---------------------------------------------------------------------------
# top_parts_per_segment — per-group top-k: the rank<=k filter directly over
# a rank window compiles to WindowGroupLimit (Spark 3.5+), which keeps only
# k rows per group on each map side BEFORE the window shuffle — at 100 TB
# the shuffle carries k*groups rows instead of the whole fact join.
# Deterministic tie-break on partkey so both engines rank identically.
# ---------------------------------------------------------------------------

_TOP_PARTS_K = 3


@register(
    "top_parts_per_segment",
    oracle=f"""
    WITH rev AS (
      SELECT c.c_mktsegment, l.l_partkey,
        CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY c.c_mktsegment, l.l_partkey
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                   ORDER BY revenue DESC, l_partkey ASC) AS rnk
      FROM rev
    )
    SELECT c_mktsegment, l_partkey, revenue, rnk
    FROM ranked WHERE rnk <= {_TOP_PARTS_K}
    """,
)
def top_parts_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} revenue parts per market segment (rank window + filter →
    WindowGroupLimit map-side pre-pruning)."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    customer = F.broadcast(load(spark, sf_dir, "customer"))
    rev = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_mktsegment", "l_partkey")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue")
        )
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("revenue").desc(), F.col("l_partkey").asc()
    )
    return (
        rev.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _TOP_PARTS_K)
    )


# ---------------------------------------------------------------------------
# user_funnel — ordered-sequence (funnel) analysis: view -> click ->
# purchase, each stage's timestamp strictly after the previous stage's.
# Computed as a cascade of conditional MIN aggregates over ONE shuffle on
# user_id (two window passes over the same partitioning, no re-shuffle):
# stage N's anchor is the min event time of type N after anchor N-1.
# ---------------------------------------------------------------------------


@register(
    "user_funnel",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
      FROM events
    ),
    v AS (
      SELECT user_id, MIN(CASE WHEN event_type = 'view' THEN ts_us END) AS first_view_us
      FROM e GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts_us) AS first_click_us
      FROM e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts_us > v.first_view_us
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts_us) AS first_purchase_us
      FROM e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts_us > c.first_click_us
      GROUP BY e.user_id
    )
    SELECT v.user_id, v.first_view_us, c.first_click_us, p.first_purchase_us,
      p.user_id IS NOT NULL AS completed
    FROM v
    LEFT JOIN c ON c.user_id = v.user_id
    LEFT JOIN p ON p.user_id = v.user_id
    WHERE v.first_view_us IS NOT NULL
    """,
)
def user_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view -> click -> purchase funnel per user with strict ordering:
    conditional-min cascade over user-partitioned windows — the oracle's
    three grouped self-joins collapse into one shuffle."""
    e = load(spark, sf_dir, "events").select("user_id", "event_type", "ts_us")
    w = Window.partitionBy("user_id")
    staged = (
        e.withColumn(
            "first_view_us",
            F.min(F.when(F.col("event_type") == "view", F.col("ts_us"))).over(w),
        )
        .withColumn(
            "first_click_us",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts_us") > F.col("first_view_us")),
                    F.col("ts_us"),
                )
            ).over(w),
        )
        .withColumn(
            "first_purchase_us",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts_us") > F.col("first_click_us")),
                    F.col("ts_us"),
                )
            ).over(w),
        )
    )
    return (
        staged.filter(F.col("first_view_us").isNotNull())
        .groupBy("user_id")
        .agg(
            F.first("first_view_us").alias("first_view_us"),
            F.first("first_click_us").alias("first_click_us"),
            F.first("first_purchase_us").alias("first_purchase_us"),
        )
        .withColumn("completed", F.col("first_purchase_us").isNotNull())
    )


# ---------------------------------------------------------------------------
# latest_event_maxby — the aggregate-form dual of latest_event_per_user:
# dedup-by-latest as max_by over a composite order key instead of a
# row_number window. The window form sorts EVERY row inside each hash
# partition; the aggregate form keeps one running champion per key and
# combines partials map-side, so the shuffle carries one row per user
# instead of one per event — the right plan when only the latest row (not
# the ranked history) is needed. Plan-asserted: partial+final aggregate
# (SortAggregate — the string-carrying max_by buffer isn't hash-aggregable),
# no Window operator.
#
# Tie-break: the order key is a zero-padded "(ts_us, event_id)" string, so
# string max == numeric max on the pair and both engines pick the same row
# even at equal timestamps (DuckDB's max_by accepts no composite ordering).
# ---------------------------------------------------------------------------

_MAXBY_ORD = (
    "concat(lpad(cast(ts_us as string), 20, '0'), lpad(cast(event_id as string), 20, '0'))"
)


@register(
    "latest_event_maxby",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, event_type,
        CAST(floor(value * 100) AS BIGINT) AS value_c,
        epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        lpad(CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS VARCHAR), 20, '0')
          || lpad(CAST(event_id AS VARCHAR), 20, '0') AS ord
      FROM events
    )
    SELECT user_id,
      COUNT(*) AS n_events,
      max_by(event_id, ord) AS latest_event_id,
      max_by(event_type, ord) AS latest_event_type,
      max_by(value_c, ord) AS latest_value_c,
      MAX(ts_us) AS latest_ts_us
    FROM e
    GROUP BY user_id
    """,
)
def latest_event_maxby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest event per user via max_by aggregation — no window, no sort;
    one partial-combinable aggregate per user."""
    e = load(spark, sf_dir, "events").selectExpr(
        "user_id",
        "event_id",
        "event_type",
        "cast(floor(value * 100) as bigint) AS value_c",
        "ts_us",
        f"{_MAXBY_ORD} AS ord",
    )
    return e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr("max_by(event_id, ord)").alias("latest_event_id"),
        F.expr("max_by(event_type, ord)").alias("latest_event_type"),
        F.expr("max_by(value_c, ord)").alias("latest_value_c"),
        F.max("ts_us").alias("latest_ts_us"),
    )


# ---------------------------------------------------------------------------
# order_percentile_window — the remaining analytic-window functions
# (cume_dist / first_value / nth_value / full-frame last_value) in one query.
# ---------------------------------------------------------------------------

_OPW_MONTH = ("1997-03-01", "1997-04-01")


@register(
    "order_percentile_window",
    oracle=f"""
    WITH o AS (
      SELECT o_orderkey, o_orderstatus,
        CAST(floor(o_totalprice * 100) AS BIGINT) AS price_c
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '{_OPW_MONTH[0]} 00:00:00'
        AND o_orderdate <  TIMESTAMP '{_OPW_MONTH[1]} 00:00:00'
    )
    SELECT o_orderkey, o_orderstatus, price_c,
      cume_dist() OVER w AS cume_pct,
      first_value(price_c) OVER w AS min_price_c,
      nth_value(price_c, 2) OVER
        (PARTITION BY o_orderstatus ORDER BY price_c, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_price_c,
      last_value(price_c) OVER
        (PARTITION BY o_orderstatus ORDER BY price_c, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        AS max_price_c
    FROM o
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY price_c, o_orderkey)
    """,
)
def order_percentile_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic-window coverage: cume_dist, first_value, frame-respecting
    nth_value, and full-frame last_value over one month's orders per
    status.

    Determinism: the window orders by (price_c, o_orderkey) — a total order
    — so frame-dependent functions (first/nth/last) are well-defined;
    cume_dist is a count ratio (int/int division). The explicit ROWS frames
    pin the one place engines default differently (last_value's default
    RANGE frame ends at CURRENT ROW, making it trivially the row's own
    value — the full frame is stated on both sides). Scale: one keyed
    window sort over a month partition — at 100 TB the month filter is a
    partition-pruned scan and the sort is per-status-key parallel."""
    month_lo, month_hi = _OPW_MONTH
    o = (
        load(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit(month_lo).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(month_hi).cast("timestamp"))
        )
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)").alias("price_c"),
        )
    )
    w = Window.partitionBy("o_orderstatus").orderBy("price_c", "o_orderkey")
    w_cur = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        "price_c",
        F.cume_dist().over(w).alias("cume_pct"),
        F.first("price_c").over(w_cur).alias("min_price_c"),
        F.nth_value("price_c", 2).over(w_cur).alias("second_price_c"),
        F.last("price_c").over(w_full).alias("max_price_c"),
    )
