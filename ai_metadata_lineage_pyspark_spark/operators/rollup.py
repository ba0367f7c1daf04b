"""Aggregation operator surface: multi-key hash aggregation with aliases,
post-agg derivation, conditional aggregation, and the flagship 2-level
customer-value rollup (the ``entry()`` query).

Reference semantics: script_a (groupBy.agg(sum.alias) + withColumn on agg
result), script_b (agg join + derived flag), script_06/script_10 SQL GROUP BY
shapes (MIN/MAX/COUNT/COUNT DISTINCT, SUM(CASE WHEN), re-aggregation over an
aggregate CTE, CASE segmentation).

Determinism contract: money aggregations run in DECIMAL (exact, summation-
order-independent — float sums would differ between engines and between
partitionings of the same cluster) and are cast to DOUBLE at the output
boundary, so results are bit-identical at any scale factor / parallelism.

Scale notes: all aggregations are partial-aggregated map-side by Catalyst
(hash aggregate with partial_merge), so the shuffle carries one row per
(key, grouping) per map task, not raw data. The 2-level rollup reuses the
same `customer_id` partitioning for both levels — one exchange, two aggs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.io import load
from ..registry import register

# Exact-decimal building blocks shared by the money aggregations.
# NB: built lazily — constructing a Column at module import requires an active
# SparkContext, which breaks import-before-session callers (bench, pytest
# collection, the driver's queries() probe).


def _one() -> Column:
    return F.lit(1).cast("decimal(3,2)")


def _dec(col: str, t: str = "decimal(12,2)") -> Column:
    return F.col(col).cast(t)


def _disc_price() -> Column:
    """l_extendedprice * (1 - l_discount), exact decimal(18,4)."""
    return _dec("l_extendedprice") * (_one() - _dec("l_discount", "decimal(4,2)"))


# ---------------------------------------------------------------------------
# pricing_summary — TPC-H Q1 shape exercising the script_06:26-36 /
# script_10:25-45 SQL aggregate surface (SUM/AVG/MIN/MAX/COUNT/COUNT
# DISTINCT + arithmetic inside agg). Headline bench query.
# ---------------------------------------------------------------------------


@register(
    "pricing_summary",
    oracle="""
    SELECT
      l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)      AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
      CAST(CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
               * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))) * 100)
           AS BIGINT) AS DOUBLE) / 100 AS sum_charge,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)      AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*)       AS avg_disc,
      COUNT(*) AS count_order,
      COUNT(DISTINCT l_orderkey) AS distinct_orders
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    bench=True,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    qty = _dec("l_quantity")
    ext = _dec("l_extendedprice")
    disc = _dec("l_discount", "decimal(4,2)")
    tax = _dec("l_tax", "decimal(4,2)")
    n = F.count(F.lit(1))
    return (
        li.filter(F.to_date("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(ext).cast("double").alias("sum_base_price"),
            F.sum(ext * (_one() - disc)).cast("double").alias("sum_disc_price"),
            # sum_charge is the one scale-6 money sum: at 10x-sf magnitude
            # its exact decimal needs > 2^53 micro-units, so the bare
            # decimal->double conversion can differ by 1 ulp between
            # engines (caught by the r9 sf1 sweep: ...94159 vs ...941593).
            # Derive the double from floored CENTS (< 2^53, exactly
            # representable; /100 identical IEEE both sides). The scale-2/4
            # sums stay bare: their unscaled ints fit 2^53 at any
            # plausible SF.
            (
                F.floor(F.sum(ext * (_one() - disc) * (_one() + tax)) * 100)
                .cast("bigint")
                .cast("double")
                / 100
            ).alias("sum_charge"),
            (F.sum(qty).cast("double") / n).alias("avg_qty"),
            (F.sum(ext).cast("double") / n).alias("avg_price"),
            (F.sum(disc).cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
            F.countDistinct("l_orderkey").alias("distinct_orders"),
        )
    )


# ---------------------------------------------------------------------------
# customer_agg — script_a_customer_agg.py:5-11: multi-key groupBy with
# aliased sums + post-aggregation withColumn derivation.
# ---------------------------------------------------------------------------


@register(
    "customer_agg",
    oracle="""
    SELECT
      l_orderkey, l_partkey,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)      AS total_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total_revenue,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
        + CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS big_amount
    FROM lineitem
    GROUP BY l_orderkey, l_partkey
    """,
)
def customer_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey", "l_partkey")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("total_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("total_revenue"),
        )
        .withColumn("big_amount", F.col("total_qty") + F.col("total_revenue"))
    )


# ---------------------------------------------------------------------------
# join_products_flag — script_b_join_products.py:6-10: aggregate output
# joined to a dimension on column name (left), derived margin + boolean
# profitability flag. part is broadcast (small dim).
# ---------------------------------------------------------------------------


@register(
    "join_products_flag",
    oracle="""
    WITH agg AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS net_revenue,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
      FROM lineitem
      GROUP BY l_partkey
    )
    SELECT
      a.l_partkey, a.net_revenue, a.total_qty,
      p.p_name, p.p_retailprice,
      a.net_revenue - p.p_retailprice AS margin,
      CASE WHEN a.net_revenue - p.p_retailprice > 0 THEN TRUE ELSE FALSE END AS is_profitable
    FROM agg a
    LEFT JOIN part p ON a.l_partkey = p.p_partkey
    """,
)
def join_products_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = F.broadcast(load(spark, sf_dir, "part"))
    agg = li.groupBy("l_partkey").agg(
        F.sum(_disc_price()).cast("double").alias("net_revenue"),
        F.sum(_dec("l_quantity")).cast("double").alias("total_qty"),
    )
    return (
        agg.join(part, agg.l_partkey == part.p_partkey, "left")
        .withColumn("margin", F.col("net_revenue") - F.col("p_retailprice"))
        .withColumn(
            "is_profitable",
            F.when(F.col("net_revenue") - F.col("p_retailprice") > 0, F.lit(True)).otherwise(
                F.lit(False)
            ),
        )
        .select(
            "l_partkey", "net_revenue", "total_qty", "p_name", "p_retailprice", "margin",
            "is_profitable",
        )
    )


# ---------------------------------------------------------------------------
# mart_customer_value — FLAGSHIP (entry()). script_10_mart_customer_value.py
# :13-65: base join -> daily conditional agg -> customer rollup -> dimension
# join -> CASE segmentation. orders↔lineitem shuffle-hash-joins on orderkey;
# both aggregation levels share the customer_id hash partitioning.
# ---------------------------------------------------------------------------


@register(
    "mart_customer_value",
    oracle="""
    WITH base AS (
      SELECT
        o.o_custkey AS customer_id,
        CAST(o.o_orderdate AS DATE) AS order_date,
        CAST(l.l_extendedprice AS DECIMAL(12,2))
          * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2))) AS amount,
        CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS is_refund,
        COALESCE(l.l_discount, 0) AS raw_risk_score,
        CASE WHEN l.l_returnflag = 'R' THEN 'high' ELSE 'low' END AS risk_bucket
      FROM orders o
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    daily AS (
      SELECT
        customer_id, order_date,
        SUM(amount) AS daily_spend,
        SUM(CASE WHEN is_refund = 1 THEN amount ELSE CAST(0 AS DECIMAL(18,4)) END) AS daily_refund_amt,
        MAX(raw_risk_score) AS max_risk_score_day,
        MAX(CASE WHEN risk_bucket IN ('critical', 'high') THEN 1 ELSE 0 END) AS any_high_risk_day
      FROM base
      GROUP BY customer_id, order_date
    ),
    customer_rollup AS (
      SELECT
        customer_id,
        CAST(SUM(daily_spend) AS DOUBLE) AS total_spend,
        CAST(SUM(daily_refund_amt) AS DOUBLE) AS total_refunds,
        CAST(SUM(daily_spend) - SUM(daily_refund_amt) AS DOUBLE) AS net_spend,
        CAST(SUM(daily_spend) AS DOUBLE) / COUNT(*) AS avg_daily_spend,
        MAX(max_risk_score_day) AS max_risk_score,
        MAX(any_high_risk_day) AS ever_high_risk
      FROM daily
      GROUP BY customer_id
    )
    SELECT
      c.c_custkey AS customer_id,
      c.c_mktsegment AS customer_tier,
      cr.total_spend, cr.total_refunds, cr.net_spend, cr.avg_daily_spend,
      cr.max_risk_score, cr.ever_high_risk,
      CASE
        WHEN cr.total_spend >= 500000 AND cr.ever_high_risk = 0 THEN 'VIP_SAFE'
        WHEN cr.total_spend >= 500000 AND cr.ever_high_risk = 1 THEN 'VIP_RISK'
        WHEN cr.total_spend >= 150000 THEN 'HIGH_VALUE'
        ELSE 'STANDARD'
      END AS customer_segment
    FROM customer c
    LEFT JOIN customer_rollup cr ON c.c_custkey = cr.customer_id
    """,
    bench=True,
)
def mart_customer_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").alias("o")
    li = load(spark, sf_dir, "lineitem").alias("l")
    customer = load(spark, sf_dir, "customer").alias("c")

    amount = _dec("l.l_extendedprice") * (_one() - _dec("l.l_discount", "decimal(4,2)"))
    base = orders.join(li, F.col("o.o_orderkey") == F.col("l.l_orderkey"), "inner").select(
        F.col("o.o_custkey").alias("customer_id"),
        F.to_date("o.o_orderdate").alias("order_date"),
        amount.alias("amount"),
        F.when(F.col("l.l_returnflag") == "R", 1).otherwise(0).alias("is_refund"),
        F.coalesce(F.col("l.l_discount"), F.lit(0.0)).alias("raw_risk_score"),
        F.when(F.col("l.l_returnflag") == "R", "high").otherwise("low").alias("risk_bucket"),
    )

    daily = base.groupBy("customer_id", "order_date").agg(
        F.sum("amount").alias("daily_spend"),
        F.sum(
            F.when(F.col("is_refund") == 1, F.col("amount")).otherwise(
                F.lit(0).cast("decimal(18,4)")
            )
        ).alias("daily_refund_amt"),
        F.max("raw_risk_score").alias("max_risk_score_day"),
        F.max(
            F.when(F.col("risk_bucket").isin("critical", "high"), 1).otherwise(0)
        ).alias("any_high_risk_day"),
    )

    rollup = daily.groupBy("customer_id").agg(
        F.sum("daily_spend").cast("double").alias("total_spend"),
        F.sum("daily_refund_amt").cast("double").alias("total_refunds"),
        (F.sum("daily_spend") - F.sum("daily_refund_amt")).cast("double").alias("net_spend"),
        (F.sum("daily_spend").cast("double") / F.count(F.lit(1))).alias("avg_daily_spend"),
        F.max("max_risk_score_day").alias("max_risk_score"),
        F.max("any_high_risk_day").alias("ever_high_risk"),
    )

    # customer LEFT JOIN rollup: both sides are per-customer cardinality, so a
    # broadcast hint would be wrong at scale; the rollup side arrives already
    # hash-partitioned by customer_id, so the shuffle is one-sided.
    return customer.join(rollup, F.col("c.c_custkey") == rollup.customer_id, "left").select(
        F.col("c.c_custkey").alias("customer_id"),
        F.col("c.c_mktsegment").alias("customer_tier"),
        "total_spend",
        "total_refunds",
        "net_spend",
        "avg_daily_spend",
        "max_risk_score",
        "ever_high_risk",
        F.when((F.col("total_spend") >= 500000) & (F.col("ever_high_risk") == 0), "VIP_SAFE")
        .when((F.col("total_spend") >= 500000) & (F.col("ever_high_risk") == 1), "VIP_RISK")
        .when(F.col("total_spend") >= 150000, "HIGH_VALUE")
        .otherwise("STANDARD")
        .alias("customer_segment"),
    )


# ---------------------------------------------------------------------------
# hypertable_rollup_cascade — multi-resolution time rollup where each coarser
# level aggregates the NEXT FINER rollup, not the raw events (the
# continuous-aggregate pattern of time-series stores): minute -> hour -> day.
# At 100 TB this is the difference between re-scanning the fact table per
# resolution and reusing O(buckets) partials; every aggregate used (count,
# sum, min, max) is decomposable, which is exactly what makes the cascade
# semantically equal to aggregating raw data directly — and the oracle
# asserts that equality by computing the day level straight from raw events.
# ---------------------------------------------------------------------------


@register(
    "hypertable_rollup_cascade",
    oracle="""
    WITH e AS (
      SELECT event_type,
        epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        CAST(floor(value * 100) AS BIGINT) AS value_c
      FROM events
    ),
    fine AS (
      SELECT event_type, ts_us // 60000000 AS minute_bucket,
        COUNT(*) AS n, CAST(SUM(value_c) AS BIGINT) AS value_c,
        MIN(ts_us) AS first_us, MAX(ts_us) AS last_us
      FROM e GROUP BY 1, 2
    )
    SELECT event_type,
      make_timestamp((minute_bucket // 1440) * 86400000000) AS day_start,
      CAST(SUM(n) AS BIGINT) AS n_events,
      CAST(SUM(value_c) AS BIGINT) AS value_c,
      COUNT(*) AS n_active_minutes,
      MIN(first_us) AS first_us,
      MAX(last_us) AS last_us
    FROM fine
    GROUP BY 1, 2
    """,
)
def hypertable_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-level rollup derived through a minute -> hour -> day cascade of
    decomposable partial aggregates (count/sum/min/max merge losslessly)."""
    e = load(spark, sf_dir, "events").select(
        "event_type",
        "ts_us",
        F.expr("cast(floor(value * 100) as bigint)").alias("value_c"),
    )
    minute = e.groupBy(
        "event_type", F.expr("ts_us div 60000000").alias("minute_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value_c").alias("value_c"),
        F.min("ts_us").alias("first_us"),
        F.max("ts_us").alias("last_us"),
    )
    hour = minute.groupBy(
        "event_type", F.expr("minute_bucket div 60").alias("hour_bucket")
    ).agg(
        F.sum("n").alias("n"),
        F.sum("value_c").alias("value_c"),
        F.count(F.lit(1)).alias("n_active_minutes"),
        F.min("first_us").alias("first_us"),
        F.max("last_us").alias("last_us"),
    )
    return hour.groupBy(
        "event_type", F.expr("hour_bucket div 24").alias("day_bucket")
    ).agg(
        F.sum("n").alias("n_events"),
        F.sum("value_c").alias("value_c"),
        F.sum("n_active_minutes").alias("n_active_minutes"),
        F.min("first_us").alias("first_us"),
        F.max("last_us").alias("last_us"),
    ).select(
        "event_type",
        F.timestamp_micros(F.expr("day_bucket * 86400000000")).cast("timestamp_ntz")
        .alias("day_start"),
        "n_events",
        "value_c",
        "n_active_minutes",
        "first_us",
        "last_us",
    )


# ---------------------------------------------------------------------------
# customer_value_deciles — NTILE bucketing over a deterministic total order:
# equal-population value tiers (decile 1 = top spenders). The window sorts
# once on (acctbal DESC, custkey) — the tie-break makes the tile assignment
# identical across engines and partitionings — then the per-decile rollup is
# a tiny aggregation.
# ---------------------------------------------------------------------------


@register(
    "customer_value_deciles",
    oracle="""
    WITH t AS (
      SELECT c_custkey, c_mktsegment, c_acctbal,
        NTILE(10) OVER (ORDER BY c_acctbal DESC, c_custkey ASC) AS decile
      FROM customer
    )
    SELECT decile,
      COUNT(*) AS n_customers,
      MIN(c_acctbal) AS min_acctbal,
      MAX(c_acctbal) AS max_acctbal,
      MIN(c_custkey) AS min_custkey
    FROM t
    GROUP BY decile
    """,
)
def customer_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Account-balance deciles via NTILE(10) over a tie-broken total order.

    Scale note: an unpartitioned window funnels all rows through ONE task —
    fine at dimension-table cardinality (customers), wrong for a fact table.
    The 100 TB swap keeps the same output contract but assigns tiles by
    comparing against approx_percentile boundaries (embarrassingly parallel,
    one tiny boundary broadcast); NTILE is used here because its exact
    equal-population semantics are what the oracle can replay verbatim."""
    from pyspark.sql import Window

    c = load(spark, sf_dir, "customer")
    w = Window.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    t = c.select(
        "c_custkey", "c_acctbal", F.ntile(10).over(w).alias("decile")
    )
    return t.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.min("c_acctbal").alias("min_acctbal"),
        F.max("c_acctbal").alias("max_acctbal"),
        F.min("c_custkey").alias("min_custkey"),
    )


@register("customer_value_deciles_approx", oracle=None)  # rows-only: sketch
def customer_value_deciles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documented 100 TB swap for `customer_value_deciles`: instead of
    one global NTILE window (all rows through ONE task), compute the nine
    decile boundaries with `approx_percentile` (mergeable sketch, partial
    aggregation), broadcast the single boundary row, and assign each row's
    tile with an embarrassingly parallel array fold — no global sort, no
    single-task funnel. Decile 1 = top balances, same output contract as the
    exact operator. Rows-only by design (sketch boundaries are
    accuracy-bounded, not bit-reproducible); tests/test_approx.py pins
    population balance and tier monotonicity against the exact result."""
    c = load(spark, sf_dir, "customer")
    bounds = c.agg(
        F.expr(
            "approx_percentile(c_acctbal,"
            " array(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9), 10000)"
        ).alias("bounds")
    )
    t = c.crossJoin(F.broadcast(bounds)).select(
        "c_custkey",
        "c_acctbal",
        # ascending bucket 1..10 via boundary fold, flipped so decile 1 = top
        F.expr(
            "11 - (1 + aggregate(bounds, 0,"
            " (a, b) -> a + CASE WHEN c_acctbal > b THEN 1 ELSE 0 END))"
        ).alias("decile"),
    )
    return t.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.min("c_acctbal").alias("min_acctbal"),
        F.max("c_acctbal").alias("max_acctbal"),
        F.min("c_custkey").alias("min_custkey"),
    )


# ---------------------------------------------------------------------------
# incremental_event_rollup — high-watermark incremental processing: the
# batch-CDC contract every scheduled pipeline relies on. The event stream is
# processed as two batches split at a watermark timestamp; each batch is
# aggregated to per-user partials independently, and the partials merge into
# the final state. Because every aggregate is decomposable, the merged
# result is provably identical to a full recompute — which is exactly what
# the oracle does (one direct GROUP BY over everything). At 100 TB the first
# batch is yesterday's materialized partials that are never re-scanned; only
# the tail beyond the watermark is read.
# ---------------------------------------------------------------------------

# fixed mid-January watermark (epoch micros): both fixture batches non-empty
_WATERMARK_US = 1_705_276_800_000_000  # 2024-01-15T00:00:00Z


@register(
    "incremental_event_rollup",
    oracle="""
    SELECT user_id,
      COUNT(*) AS events,
      CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS total_value_c,
      MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS first_ts_us,
      MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS last_ts_us
    FROM events
    GROUP BY user_id
    """,
)
def incremental_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rollup computed incrementally: aggregate the pre-watermark
    batch and the post-watermark batch separately, then merge the partials.
    Value-identical to the oracle's single-pass GROUP BY."""
    e = load(spark, sf_dir, "events").select(
        "user_id",
        "ts_us",
        F.expr("cast(floor(value * 100) as bigint)").alias("value_c"),
    )

    def partials(batch: DataFrame) -> DataFrame:
        return batch.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("p_events"),
            F.sum("value_c").alias("p_value_c"),
            F.min("ts_us").alias("p_first"),
            F.max("ts_us").alias("p_last"),
        )

    before = partials(e.filter(F.col("ts_us") <= _WATERMARK_US))
    after = partials(e.filter(F.col("ts_us") > _WATERMARK_US))
    return (
        before.unionByName(after)
        .groupBy("user_id")
        .agg(
            F.sum("p_events").alias("events"),
            F.sum("p_value_c").alias("total_value_c"),
            F.min("p_first").alias("first_ts_us"),
            F.max("p_last").alias("last_ts_us"),
        )
    )


# ---------------------------------------------------------------------------
# orders_cube — CUBE(status, priority): all four grouping sets (detail, per-
# status, per-priority, grand total) from ONE pass. ROLLUP walks only the
# prefix hierarchy; CUBE expands every subset — 2^n grouping sets — so the
# expand operator multiplies each input row by 4 here. At scale that
# multiplier is the cost knob: partial aggregation runs AFTER the expand,
# so map-side combine still collapses each grouping set to its key space
# before the one shuffle. grouping() flags distinguish subtotal NULLs from
# genuine NULL keys, same convention as orders_rollup_subtotals.
# ---------------------------------------------------------------------------


@register(
    "orders_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
      COUNT(*) AS n_orders,
      CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_price_c,
      CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
      CAST(GROUPING(o_orderpriority) AS INT) AS g_priority
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def orders_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): every margin of the 2-D contingency
    table in one aggregation pass, integer-cent money."""
    orders = load(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.expr("sum(cast(floor(o_totalprice * 100) as bigint))").alias("total_price_c"),
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_priority"),
    )
