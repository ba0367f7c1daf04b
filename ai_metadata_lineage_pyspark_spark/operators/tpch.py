"""TPC-H-shaped multi-join analytics over the fixture star schema — the
decision-support query classics (Q3/Q5/Q15 shapes) adapted to the fixture's
columns. These widen the engine's relational surface with the three join
topologies the round-1 set didn't exercise end-to-end:

* fact⋈fact shuffle join with dim broadcast + top-N (`order_shipping_priority`)
* a 6-table snowflake chain with a cross-dim equality (customer's nation ==
  supplier's nation) resolved bucket-locally (`local_supplier_volume`)
* aggregate -> global-argmax via a broadcast 1-row reduction
  (`top_supplier_revenue`)

Money math is exact integer units end-to-end: price cents (floor(p*100))
times integer discount-percent remainder, so SUMs are BIGINT-exact and
cross-engine ties in the ORDER BY cannot diverge.

Scale notes: lineitem⋈orders shuffles on the join key both sides (at 100 TB
these would be bucketed/bucket-colocated — see bucketed_join_colocated for
the demonstrated zero-exchange variant); customer/supplier/nation/region are
dimension-sized and broadcast, so the only wide exchanges are the two fact
shuffles and the final partial-combined aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.cache import release_persisted, scoped_persist
from ..functions.io import load
from ..registry import register

_Q3_SEGMENT = "BUILDING"
_Q3_CUTOFF = "1997-06-01"
_Q5_REGION = "ASIA"
_Q5_YEAR_LO = "1996-01-01"
_Q5_YEAR_HI = "1997-01-01"
_Q15_LO = "1996-01-01"
_Q15_HI = "1996-04-01"

# exact revenue in cent·percent units: floor-cents × (100 - round(disc%))
_REV_SQL = (
    "CAST(floor(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))"
)


@register(
    "order_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
      CAST(SUM({_REV_SQL}) AS BIGINT) AS revenue_cpct,
      o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = '{_Q3_SEGMENT}'
      AND o.o_orderdate < TIMESTAMP '{_Q3_CUTOFF} 00:00:00'
      AND l.l_shipdate > TIMESTAMP '{_Q3_CUTOFF} 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue_cpct DESC, l.l_orderkey
    LIMIT 10
    """,
)
def order_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 highest-revenue orders placed before the
    cutoff but (partially) shipped after it, for one market segment.

    Plan: segment-filtered customer broadcasts into orders; the orders⋈
    lineitem equi-join shuffles on the order key; exact-integer revenue
    ranks the top 10 deterministically (ties broken by order key)."""
    cutoff = F.lit(_Q3_CUTOFF).cast("timestamp")
    c = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == _Q3_SEGMENT
    ).select("c_custkey")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(F.expr(_REV_SQL)).alias("revenue_cpct"))
        .select("l_orderkey", "revenue_cpct", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue_cpct").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "local_supplier_volume",
    oracle=f"""
    SELECT n.n_name AS nation,
      CAST(SUM({_REV_SQL}) AS BIGINT) AS revenue_cpct,
      COUNT(*) AS n_lineitems
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = '{_Q5_REGION}'
      AND o.o_orderdate >= TIMESTAMP '{_Q5_YEAR_LO} 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '{_Q5_YEAR_HI} 00:00:00'
    GROUP BY n.n_name
    """,
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue shipped by suppliers to customers of their
    own nation, per nation of one region, for one order year.

    Plan: the two fact tables shuffle once each (orders⋈lineitem on the
    order key after customer broadcasts in); supplier/nation/region are all
    broadcast, and the customer-nation == supplier-nation equality rides
    the broadcast-join condition — no extra exchange for the cross-dim
    constraint."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q5_YEAR_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_Q5_YEAR_HI).cast("timestamp"))
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == _Q5_REGION)
    nr = F.broadcast(
        n.join(r, n.n_regionkey == r.r_regionkey).select("n_nationkey", "n_name")
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(nr, s.s_nationkey == nr.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(F.expr(_REV_SQL)).alias("revenue_cpct"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@register(
    "top_supplier_revenue",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey,
        CAST(SUM({_REV_SQL}) AS BIGINT) AS revenue_cpct
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '{_Q15_LO} 00:00:00'
        AND l_shipdate <  TIMESTAMP '{_Q15_HI} 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, rev.revenue_cpct
    FROM rev JOIN supplier s ON s.s_suppkey = rev.l_suppkey
    WHERE rev.revenue_cpct = (SELECT MAX(revenue_cpct) FROM rev)
    """,
)
def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum shipped revenue in one
    quarter. The argmax is computed by broadcasting the 1-row global max
    back onto the per-supplier aggregate — no single-partition window, no
    second scan of lineitem (exact-integer revenue means float ties cannot
    produce engine-dependent winners)."""
    release_persisted()
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_Q15_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q15_HI).cast("timestamp"))
    )
    # the per-supplier aggregate is consumed twice (rows + global max);
    # persisting it keeps lineitem to ONE scan — it's supplier-cardinality,
    # so the cache is dimension-sized at any corpus scale
    rev = scoped_persist(
        li.groupBy("l_suppkey").agg(F.sum(F.expr(_REV_SQL)).alias("revenue_cpct"))
    )
    mx = rev.agg(F.max("revenue_cpct").alias("mx"))
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), rev.revenue_cpct == F.col("mx"))
        .join(F.broadcast(s), rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "revenue_cpct")
    )


_Q4_LO = "1996-01-01"
_Q4_HI = "1996-04-01"
_Q4_LATE_DAYS = 60
_Q18_MIN_QTY = 140
_Q22_SEGMENTS = ("AUTOMOBILE", "HOUSEHOLD", "MACHINERY")
_Q22_RECENT = "2000-06-01"


@register(
    "late_shipment_priority",
    oracle=f"""
    SELECT o.o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '{_Q4_LO} 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '{_Q4_HI} 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL {_Q4_LATE_DAYS} DAY
      )
    GROUP BY o.o_orderpriority
    """,
)
def late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (correlated EXISTS): orders placed in one quarter that
    have at least one lineitem shipped more than N days after the order
    date, counted per priority. The fixture lacks commit/receipt dates
    (reference script_05 has no temporal SLA either), so lateness is
    ship-vs-order-date.

    Plan: the EXISTS becomes a LEFT SEMI join orders->lineitem on the order
    key with the lateness predicate riding the join condition — one shuffle
    on the key, no duplicate-order inflation, semi-join stops probing a key
    at first match. At 100 TB both sides are date-partition-prunable before
    the shuffle."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q4_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_Q4_HI).cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate
        > F.col("o_orderdate") + F.expr(f"INTERVAL {_Q4_LATE_DAYS} DAYS")
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "large_order_customers",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey,
        CAST(SUM(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
      FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(floor(l_quantity) AS BIGINT)) >= {_Q18_MIN_QTY}
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, big.total_qty
    FROM big
    JOIN orders o ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY big.total_qty DESC, o.o_orderkey
    LIMIT 20
    """,
)
def large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (HAVING + join-back): orders whose total quantity
    crosses a threshold, joined back to orders+customer, top-20 by volume.
    Quantities are whole numbers stored as double; floor+BIGINT keeps the
    sum and threshold integer-exact across engines.

    Plan: the aggregate runs with map-side partial combine on the natural
    lineitem key; the HAVING filter collapses it to a tiny survivor set
    which then BROADCASTS into orders (no second fact shuffle), and
    customer is dimension-broadcast. Top-20 is TakeOrderedAndProject."""
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.floor("l_quantity").cast("bigint")).alias("total_qty"))
        .filter(F.col("total_qty") >= _Q18_MIN_QTY)
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "total_qty")
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey"))
        .limit(20)
    )


@register(
    "idle_rich_customers",
    oracle=f"""
    WITH cents AS (
      SELECT c_custkey, c_mktsegment,
        CAST(floor(c_acctbal * 100) AS BIGINT) AS bal_cents
      FROM customer
      WHERE c_mktsegment IN {_Q22_SEGMENTS!r}
    ), cutoff AS (
      SELECT CAST(SUM(bal_cents) / COUNT(*) AS BIGINT) AS avg_cents
      FROM cents WHERE bal_cents > 0
    )
    SELECT cents.c_mktsegment,
      COUNT(*) AS n_customers,
      CAST(SUM(cents.bal_cents) AS BIGINT) AS total_bal_cents
    FROM cents, cutoff
    WHERE cents.bal_cents > cutoff.avg_cents
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = cents.c_custkey
          AND o.o_orderdate >= TIMESTAMP '{_Q22_RECENT} 00:00:00'
      )
    GROUP BY cents.c_mktsegment
    """,
)
def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (scalar subquery + anti join): customers in selected
    segments whose balance exceeds the positive-balance average and who
    have placed no RECENT order (the fixture has no order-less customers,
    so recency stands in for Q22's never-ordered test). Balances become
    integer cents and the average is integer-division of exact integer
    sums, so the cutoff is bit-identical across engines regardless of
    summation order.

    Plan: the 1-row cutoff broadcasts as a cross join (Spark plans a
    BroadcastNestedLoopJoin over a single row — free); the no-recent-orders
    test is a LEFT ANTI join whose probe side is date-filtered BEFORE the
    shuffle (partition-prunable at scale); the final rollup is
    segment-cardinality."""
    cents = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment").isin(*_Q22_SEGMENTS))
        .select(
            "c_custkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") * 100).cast("bigint").alias("bal_cents"),
        )
    )
    cutoff = (
        cents.filter(F.col("bal_cents") > 0)
        .agg(
            (F.sum("bal_cents") / F.count(F.lit(1)))
            .cast("bigint")
            .alias("avg_cents")
        )
    )
    o_keys = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit(_Q22_RECENT).cast("timestamp"))
        .select("o_custkey")
    )
    return (
        cents.join(F.broadcast(cutoff))
        .filter(F.col("bal_cents") > F.col("avg_cents"))
        .join(o_keys, cents.c_custkey == o_keys.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("bal_cents").alias("total_bal_cents"),
        )
    )
