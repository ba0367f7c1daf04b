"""The remaining TPC-H query shapes (Q2, Q6-Q14, Q16, Q17, Q19-Q21),
adapted to the fixture star schema — completing the 22-query decision-support
suite together with operators/tpch.py (Q3/Q5/Q15) and the Q1/Q4/Q18/Q22
shapes in rollup.py/setops.py.

Adaptations forced by the fixture schema (no partsupp table; lineitem has no
l_commitdate / l_receiptdate / l_shipmode; part has no p_container /
p_mfgr):

* Q2's supply cost     -> min observed unit sale price from lineitem
* Q9's ps_supplycost   -> p_retailprice as the unit cost proxy
* Q11's stock value    -> shipped extended-price value per (nation, part)
* Q12's shipmode/late  -> ship-delay bands (shipdate - orderdate)
* Q16's partsupp pairs -> observed (supplier, part) pairs from lineitem
* Q20's availqty       -> shipped quantity per (supplier, part)
* Q21's receipt>commit -> shipdate > orderdate + 90 days

Determinism across engines (the DuckDB oracle hash-compares values):

* all money is exact integers — cent units `floor(p*100)` and cent*pct
  revenue units (tpch._REV_SQL); SUMs are BIGINT-exact, never float
* ratios (Q8/Q14/Q17) are ONE division of two exact BIGINTs — IEEE divide
  on identical operands is bit-identical in both engines
* Q17's `qty < 0.2*avg(qty)` is cross-multiplied into pure-integer form
  (5*qty*cnt < sum) since quantities are integral
* every LIMIT query carries a full deterministic tie-break chain

Scale notes (100 TB): lineitem⋈orders is the only fact-fact shuffle and
always joins on the order key (bucketing co-locates it at scale); part /
supplier / nation / region / per-part pre-aggregates are dimension-sized and
explicitly broadcast; Q17/Q20's per-part thresholds are computed as
partial-aggregated groupBys (map-side combine) and broadcast back, never as
windows over the fact table (a window would sort-shuffle the full fact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.io import load
from ..registry import register
from .tpch import _REV_SQL

# exact cent / percent helper exprs (see module docstring)
_PRICE_C = "CAST(floor(l_extendedprice * 100) AS BIGINT)"
_DISC_PCT = "CAST(floor(l_discount * 100 + 0.5) AS BIGINT)"
_QTY = "CAST(l_quantity AS BIGINT)"  # quantities are integral 1..50
_RETAIL_C = "CAST(floor(p_retailprice * 100) AS BIGINT)"

_Q2_SIZE_LO, _Q2_SIZE_HI = 10, 20
_Q2_TYPE = "LARGE"
_Q6_YEAR = ("1997-01-01", "1998-01-01")
_Q7_NATIONS = ("NATION_3", "NATION_13")
_Q8_REGION = "ASIA"
_Q8_NATION = "NATION_12"
_Q8_TYPE = "STANDARD"
_Q9_PART_LIKE = "%widget"
_Q10_QUARTER = ("1997-01-01", "1997-04-01")
_Q14_MONTH = ("1997-03-01", "1997-04-01")
_Q16_SIZES = (1, 5, 9, 13, 17, 21, 25, 29, 33, 37, 41, 45, 49)
_Q17_BRAND = "Brand#13"
_Q20_PREFIX = "large%"
_Q20_YEAR = ("1997-01-01", "1998-01-01")
_Q20_MIN_QTY = 50
_Q21_LATE_DAYS = 90


def _nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")


# --------------------------------------------------------------------------
# Q2: min-cost supplier per part
# --------------------------------------------------------------------------


@register(
    "min_cost_supplier",
    oracle=f"""
    WITH offers AS (
      SELECT l_partkey, l_suppkey,
        MIN(CAST(floor(l_extendedprice * 100 / l_quantity) AS BIGINT)) AS cost_c
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      WHERE p_size BETWEEN {_Q2_SIZE_LO} AND {_Q2_SIZE_HI} AND p_type = '{_Q2_TYPE}'
      GROUP BY l_partkey, l_suppkey
    ),
    best AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY l_partkey ORDER BY cost_c, l_suppkey) AS rn
      FROM offers
    )
    SELECT s.s_acctbal, s.s_name, n.n_name AS nation,
           p.p_partkey, p.p_name, b.cost_c
    FROM best b
    JOIN supplier s ON b.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN part p ON b.l_partkey = p.p_partkey
    WHERE b.rn = 1
    ORDER BY s.s_acctbal DESC, nation, s.s_name, p.p_partkey
    LIMIT 100
    """,
)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each part of one size-band/type, the supplier offering
    the lowest observed unit price (partsupp's supply cost re-derived from
    lineitem sale records), top-100 by supplier balance.

    Plan: the filtered part list broadcasts into lineitem BEFORE the offers
    aggregation, so the per-(part, supplier) groupBy only shuffles matching
    rows; the argmin-per-part window runs over the already-tiny offer table;
    supplier/nation/part attribute joins are all broadcast."""
    p = load(spark, sf_dir, "part").filter(
        F.col("p_size").between(_Q2_SIZE_LO, _Q2_SIZE_HI) & (F.col("p_type") == _Q2_TYPE)
    )
    li = load(spark, sf_dir, "lineitem").join(
        F.broadcast(p.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey")
    )
    offers = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.expr("CAST(floor(l_extendedprice * 100 / l_quantity) AS BIGINT)")).alias(
            "cost_c"
        )
    )
    w = Window.partitionBy("l_partkey").orderBy("cost_c", "l_suppkey")
    best = offers.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    s = load(spark, sf_dir, "supplier")
    n = _nations(spark, sf_dir)
    return (
        best.join(F.broadcast(s), best.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(p), best.l_partkey == p.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            F.col("n_name").alias("nation"),
            "p_partkey",
            "p_name",
            "cost_c",
        )
        .orderBy(F.col("s_acctbal").desc(), "nation", "s_name", "p_partkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q6: forecasting revenue change
# --------------------------------------------------------------------------


@register(
    "forecast_revenue_change",
    oracle=f"""
    SELECT
      CAST(SUM({_PRICE_C} * {_DISC_PCT}) AS BIGINT) AS discount_rev_cpct,
      COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{_Q6_YEAR[0]} 00:00:00'
      AND l_shipdate <  TIMESTAMP '{_Q6_YEAR[1]} 00:00:00'
      AND {_DISC_PCT} BETWEEN 5 AND 7
      AND l_quantity < 24
    """,
)
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: revenue that would have been kept by dropping a
    discount band — one scan, no joins; the canonical predicate-pushdown +
    partial-aggregation query (the shipdate filter reaches the parquet scan,
    the discount/quantity filters evaluate pre-shuffle, and the single-row
    SUM is map-side combined)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit(_Q6_YEAR[0]).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(_Q6_YEAR[1]).cast("timestamp"))
            & F.expr(f"{_DISC_PCT} BETWEEN 5 AND 7")
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(F.expr(f"{_PRICE_C} * {_DISC_PCT}")).alias("discount_rev_cpct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# Q7: volume shipping between two nations
# --------------------------------------------------------------------------


@register(
    "nation_trade_volume",
    oracle=f"""
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
      year(l.l_shipdate) AS l_year,
      CAST(SUM({_REV_SQL}) AS BIGINT) AS revenue_cpct
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation ns ON s.s_nationkey = ns.n_nationkey
    JOIN nation nc ON c.c_nationkey = nc.n_nationkey
    WHERE ((ns.n_name = '{_Q7_NATIONS[0]}' AND nc.n_name = '{_Q7_NATIONS[1]}')
        OR (ns.n_name = '{_Q7_NATIONS[1]}' AND nc.n_name = '{_Q7_NATIONS[0]}'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations per ship
    year, both directions.

    Plan: supplier⋈nation and customer⋈nation resolve dim-side first and
    broadcast pre-filtered (only the two nations' keys survive), so the
    OR-pair condition prunes both fact inputs before the one orders⋈lineitem
    shuffle; the final aggregate has at most 2 directions × 2 years groups."""
    n = _nations(spark, sf_dir).filter(F.col("n_name").isin(*_Q7_NATIONS))
    s = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        load(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(F.expr(_REV_SQL)).alias("revenue_cpct"))
    )


# --------------------------------------------------------------------------
# Q8: national market share
# --------------------------------------------------------------------------


@register(
    "nation_market_share",
    oracle=f"""
    WITH all_sales AS (
      SELECT year(o.o_orderdate) AS o_year,
        CAST({_REV_SQL} AS BIGINT) AS rev_cpct,
        ns.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation nc ON c.c_nationkey = nc.n_nationkey
      JOIN region r ON nc.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation ns ON s.s_nationkey = ns.n_nationkey
      JOIN part p ON l.l_partkey = p.p_partkey
      WHERE r.r_name = '{_Q8_REGION}' AND p.p_type = '{_Q8_TYPE}'
    )
    SELECT o_year,
      CAST(SUM(CASE WHEN supp_nation = '{_Q8_NATION}' THEN rev_cpct ELSE 0 END)
        AS BIGINT) AS nation_rev_cpct,
      CAST(SUM(rev_cpct) AS BIGINT) AS total_rev_cpct,
      CAST(SUM(CASE WHEN supp_nation = '{_Q8_NATION}' THEN rev_cpct ELSE 0 END)
        AS DOUBLE) / CAST(SUM(rev_cpct) AS DOUBLE) AS mkt_share
    FROM all_sales
    GROUP BY o_year
    """,
)
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's market for one part
    type, per order year.

    Plan: every dimension (customer-nation-region chain, supplier-nation,
    filtered part) broadcasts; the share is one double division of two
    BIGINT-exact sums, computed per year in a single aggregate — conditional
    aggregation instead of two passes."""
    n = _nations(spark, sf_dir)
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == _Q8_REGION)
    region_nations = n.join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("cn_key"))
    c = load(spark, sf_dir, "customer").join(
        F.broadcast(region_nations), F.col("c_nationkey") == F.col("cn_key")
    ).select("c_custkey")
    s = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == _Q8_TYPE).select("p_partkey")
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    nation_rev = F.sum(
        F.when(F.col("supp_nation") == _Q8_NATION, F.expr(_REV_SQL)).otherwise(F.lit(0))
    )
    total_rev = F.sum(F.expr(_REV_SQL))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            nation_rev.alias("nation_rev_cpct"),
            total_rev.alias("total_rev_cpct"),
            (nation_rev.cast("double") / total_rev.cast("double")).alias("mkt_share"),
        )
    )


# --------------------------------------------------------------------------
# Q9: product type profit
# --------------------------------------------------------------------------


@register(
    "product_type_profit",
    bench=True,
    oracle=f"""
    SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
      CAST(SUM({_REV_SQL} - {_RETAIL_C} * {_QTY} * 100) AS BIGINT) AS profit_cpct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE p.p_name LIKE '{_Q9_PART_LIKE}'
    GROUP BY nation, o_year
    """,
)
def product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on a product line per supplier nation per
    year, with p_retailprice standing in for the missing ps_supplycost.

    Profit stays in cent*pct units end-to-end: revenue_cpct minus
    retail-cents*qty*100 (scaling cost cents into the same cpct unit), so
    the SUM is BIGINT-exact. Plan: filtered part + supplier⋈nation
    broadcast into lineitem; one orders⋈lineitem shuffle; ~25x7 groups."""
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like(_Q9_PART_LIKE))
        .select("p_partkey", "p_retailprice")
    )
    s = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_nations(spark, sf_dir)),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.expr(f"{_REV_SQL} - {_RETAIL_C} * {_QTY} * 100")).alias(
                "profit_cpct"
            )
        )
    )


# --------------------------------------------------------------------------
# Q10: returned item reporting
# --------------------------------------------------------------------------


@register(
    "returned_item_report",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name AS nation,
      CAST(SUM({_REV_SQL}) AS BIGINT) AS revenue_cpct
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '{_Q10_QUARTER[0]} 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '{_Q10_QUARTER[1]} 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, nation
    ORDER BY revenue_cpct DESC, c.c_custkey
    LIMIT 20
    """,
)
def returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns in one
    quarter.

    Plan: the quarter filter prunes orders before its shuffle with the
    R-filtered lineitem; customer and nation broadcast in after the
    aggregation keys are known; deterministic top-20 (revenue desc, custkey)."""
    c = load(spark, sf_dir, "customer")
    n = _nations(spark, sf_dir)
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q10_QUARTER[0]).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_Q10_QUARTER[1]).cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", F.col("n_name").alias("nation"))
        .agg(F.sum(F.expr(_REV_SQL)).alias("revenue_cpct"))
        .select("c_custkey", "c_name", "c_acctbal", "nation", "revenue_cpct")
        .orderBy(F.col("revenue_cpct").desc(), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q11: important part value
# --------------------------------------------------------------------------


@register(
    "important_part_value",
    oracle=f"""
    WITH vals AS (
      SELECT n.n_name AS nation, l.l_partkey,
        CAST(SUM({_PRICE_C}) AS BIGINT) AS value_c
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      GROUP BY nation, l.l_partkey
    )
    SELECT nation, l_partkey, value_c
    FROM vals
    WHERE value_c * 10000 > (SELECT SUM(value_c) FROM vals)
    """,
)
def important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: (nation, part) groups whose shipped value exceeds
    0.01% of the global total — the scalar-subquery-threshold pattern.

    Plan: one groupBy over lineitem (supplier/nation broadcast in); the
    global total is a 1-row re-aggregation of the SAME grouped result
    (persist-free reuse: Spark recomputes the small grouped table, or AQE
    reuses the exchange), cross-joined back as a broadcast literal — never a
    second scan-wide shuffle. NOTE (r14): scoped_persist of the grouped
    table was tried and REVERTED — the A/B measured 1.14s -> 1.61s steady /
    0.9s -> 1.8s stage-CPU at sf0.1: the duplicated subtree is one
    broadcast join + partial agg over a columnar scan, cheaper than the
    cache build + the pipeline barrier the persist adds
    (tools/opt_measure.py, OPTIMIZATION_r14.md §2.4-details)."""
    s = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_nations(spark, sf_dir)),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    li = load(spark, sf_dir, "lineitem")
    vals = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("nation", "l_partkey")
        .agg(F.sum(F.expr(_PRICE_C)).alias("value_c"))
    )
    total = vals.agg(F.sum("value_c").alias("total_c"))
    return (
        vals.crossJoin(F.broadcast(total))
        .filter(F.col("value_c") * 10000 > F.col("total_c"))
        .select("nation", "l_partkey", "value_c")
    )


# --------------------------------------------------------------------------
# Q12: shipping delay vs priority
# --------------------------------------------------------------------------

_DELAY_BAND_SQL = (
    "CASE WHEN datediff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) < 30"
    " THEN 'FAST' WHEN datediff('day', CAST(o_orderdate AS DATE),"
    " CAST(l_shipdate AS DATE)) < 60 THEN 'MEDIUM' ELSE 'SLOW' END"
)


@register(
    "shipping_delay_priority",
    oracle=f"""
    SELECT {_DELAY_BAND_SQL} AS delay_band,
      CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    GROUP BY delay_band
    """,
)
def shipping_delay_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: line counts of high- vs low-priority orders per
    ship-delay band (the schema has no shipmode/commitdate; delay bands on
    shipdate - orderdate carry the same CASE-band + conditional-count
    shape).

    Plan: one fact-fact shuffle on the order key, then a 3-group conditional
    aggregate — both counts in one pass."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    delay = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    band = (
        F.when(delay < 30, "FAST").when(delay < 60, "MEDIUM").otherwise("SLOW")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(band.alias("delay_band"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# Q13: customer order-count distribution
# --------------------------------------------------------------------------


@register(
    "customer_order_distribution",
    oracle="""
    WITH c_orders AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        AND o.o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c.c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders
    GROUP BY c_count
    """,
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: histogram of per-customer order counts (customers
    with zero qualifying orders included via the outer join).

    Plan: orders pre-aggregates to (custkey, count) FIRST — a partial-
    combined groupBy on the fact — and only that dim-sized count table
    left-joins customer; the naive left-join-then-count would shuffle every
    order row against every customer. Second aggregate is histogram-sized."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    per_cust = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "4-NOT SPECIFIED")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return (
        c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left")
        .select(F.coalesce(F.col("n_orders"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


# --------------------------------------------------------------------------
# Q14: promotion revenue share
# --------------------------------------------------------------------------


@register(
    "promo_revenue_share",
    oracle=f"""
    SELECT
      CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL} ELSE 0 END)
        AS BIGINT) AS promo_rev_cpct,
      CAST(SUM({_REV_SQL}) AS BIGINT) AS total_rev_cpct,
      100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL} ELSE 0 END)
        AS DOUBLE) / CAST(SUM({_REV_SQL}) AS DOUBLE) AS promo_share_pct
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '{_Q14_MONTH[0]} 00:00:00'
      AND l_shipdate <  TIMESTAMP '{_Q14_MONTH[1]} 00:00:00'
    """,
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: share of one month's revenue from promo-type parts.

    Plan: month filter pushes to the lineitem scan, part broadcasts, one
    conditional aggregate; the percentage is one double division of two
    BIGINT-exact sums (scaled by the exact literal 100.0), so both engines
    compute the identical IEEE result."""
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_Q14_MONTH[0]).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q14_MONTH[1]).cast("timestamp"))
    )
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", F.expr(_REV_SQL)).otherwise(F.lit(0))
    )
    total = F.sum(F.expr(_REV_SQL))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            promo.alias("promo_rev_cpct"),
            total.alias("total_rev_cpct"),
            (F.lit(100.0) * promo.cast("double") / total.cast("double")).alias(
                "promo_share_pct"
            ),
        )
    )


# --------------------------------------------------------------------------
# Q16: supplier variety per part class
# --------------------------------------------------------------------------


@register(
    "supplier_part_variety",
    oracle=f"""
    SELECT p.p_brand, p.p_type, p.p_size,
      COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    WHERE p.p_brand <> 'Brand#13'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN ({', '.join(str(x) for x in _Q16_SIZES)})
      AND s.s_name NOT LIKE '%8'
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per (brand, type, size)
    over observed supplier-part pairs (the fixture has no partsupp), with a
    brand/type/size exclusion list and an excluded-supplier anti-pattern
    (name suffix standing in for Q16's complaint comment scan).

    Plan: both dimension filters broadcast; COUNT(DISTINCT) over the
    (brand,type,size) groups is a two-phase distinct aggregate — Spark
    expands to a partial distinct on (group, suppkey) before the final
    count, so the shuffle carries deduplicated pairs, not raw lineitems."""
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(*_Q16_SIZES)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    s = (
        load(spark, sf_dir, "supplier")
        .filter(~F.col("s_name").like("%8"))
        .select("s_suppkey")
    )
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# Q17: small-quantity-order revenue
# --------------------------------------------------------------------------


@register(
    "small_quantity_avg_revenue",
    oracle=f"""
    WITH stats AS (
      SELECT l_partkey AS sp_partkey,
        CAST(SUM({_QTY}) AS BIGINT) AS sum_q, COUNT(*) AS cnt_q
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE p_brand = '{_Q17_BRAND}'
      GROUP BY l_partkey
    )
    SELECT
      CAST(SUM({_PRICE_C}) AS BIGINT) AS small_rev_c,
      COUNT(*) AS n_small,
      CAST(SUM({_PRICE_C}) AS DOUBLE) / 7.0 AS avg_yearly_c
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN stats ON l_partkey = sp_partkey
    WHERE p_brand = '{_Q17_BRAND}'
      AND 5 * {_QTY} * cnt_q < sum_q
    """,
)
def small_quantity_avg_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: average yearly revenue lost if small-quantity orders
    (below 20% of the part's average order quantity) were not filled.

    The `qty < 0.2 * avg(qty)` correlated subquery is cross-multiplied into
    exact-integer form (5*qty*cnt < sum — quantities are integral), removing
    float-threshold ambiguity between engines. Plan: per-part (sum, count)
    is a partial-aggregated groupBy broadcast back into the fact scan — NOT
    a window over lineitem, which would sort-shuffle the whole fact table."""
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_brand") == _Q17_BRAND)
        .select("p_partkey")
    )
    li = load(spark, sf_dir, "lineitem").join(
        F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")
    )
    stats = li.groupBy(F.col("l_partkey").alias("sp_partkey")).agg(
        F.sum(F.expr(_QTY)).alias("sum_q"), F.count(F.lit(1)).alias("cnt_q")
    )
    return (
        li.join(F.broadcast(stats), F.col("l_partkey") == F.col("sp_partkey"))
        .filter(F.expr(f"5 * {_QTY}") * F.col("cnt_q") < F.col("sum_q"))
        .agg(
            F.sum(F.expr(_PRICE_C)).alias("small_rev_c"),
            F.count(F.lit(1)).alias("n_small"),
            (F.sum(F.expr(_PRICE_C)).cast("double") / F.lit(7.0)).alias(
                "avg_yearly_c"
            ),
        )
    )


# --------------------------------------------------------------------------
# Q19: discounted revenue across brand brackets
# --------------------------------------------------------------------------

_Q19_BRACKETS = (
    ("Brand#13", 1, 11, 1, 5),
    ("Brand#20", 10, 20, 1, 10),
    ("Brand#25", 20, 30, 1, 15),
)


def _q19_pred_sql() -> str:
    parts = [
        f"(p_brand = '{b}' AND l_quantity BETWEEN {qlo} AND {qhi}"
        f" AND p_size BETWEEN {slo} AND {shi})"
        for b, qlo, qhi, slo, shi in _Q19_BRACKETS
    ]
    return " OR ".join(parts)


@register(
    "brand_bracket_revenue",
    oracle=f"""
    SELECT CAST(SUM({_REV_SQL}) AS BIGINT) AS revenue_cpct, COUNT(*) AS n_items
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE {_q19_pred_sql()}
    """,
)
def brand_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue from three OR-ed (brand, quantity-range,
    size-range) brackets — the disjunctive-predicate query.

    Plan: the brand/size half of each bracket prunes part BEFORE the
    broadcast (only bracket-matching parts ship to executors), and the
    combined OR predicate evaluates post-join inside codegen; a single scan
    of lineitem, no shuffle at all until the 1-row aggregate."""
    pred = None
    for brand, qlo, qhi, slo, shi in _Q19_BRACKETS:
        clause = (
            (F.col("p_brand") == brand)
            & F.col("l_quantity").between(qlo, qhi)
            & F.col("p_size").between(slo, shi)
        )
        pred = clause if pred is None else (pred | clause)
    brands = [b for b, *_ in _Q19_BRACKETS]
    max_size = max(shi for *_, shi in _Q19_BRACKETS)
    p = load(spark, sf_dir, "part").filter(
        F.col("p_brand").isin(*brands) & (F.col("p_size") <= max_size)
    ).select("p_partkey", "p_brand", "p_size")
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(pred)
        .agg(
            F.sum(F.expr(_REV_SQL)).alias("revenue_cpct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# Q20: suppliers with excess shipped stock
# --------------------------------------------------------------------------


@register(
    "excess_shipped_suppliers",
    oracle=f"""
    WITH shipped AS (
      SELECT l_suppkey, l_partkey, CAST(SUM({_QTY}) AS BIGINT) AS total_qty
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE '{_Q20_PREFIX}'
        AND l_shipdate >= TIMESTAMP '{_Q20_YEAR[0]} 00:00:00'
        AND l_shipdate <  TIMESTAMP '{_Q20_YEAR[1]} 00:00:00'
      GROUP BY l_suppkey, l_partkey
    )
    SELECT s.s_name, n.n_name AS nation,
      COUNT(*) AS n_excess_parts,
      CAST(SUM(total_qty) AS BIGINT) AS sum_excess_qty
    FROM shipped sh
    JOIN supplier s ON sh.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE sh.total_qty > {_Q20_MIN_QTY}
    GROUP BY s.s_name, nation
    """,
)
def excess_shipped_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who moved excess quantities of a part
    family in one year (shipped-quantity threshold standing in for the
    missing partsupp availqty), with per-supplier excess-part counts.

    Plan: name-filtered part broadcasts into the year-pruned lineitem scan;
    the (supplier, part) rollup is partial-combined; everything after the
    threshold filter is supplier-dimension-sized."""
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like(_Q20_PREFIX))
        .select("p_partkey")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_Q20_YEAR[0]).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q20_YEAR[1]).cast("timestamp"))
    )
    shipped = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.expr(_QTY)).alias("total_qty"))
        .filter(F.col("total_qty") > _Q20_MIN_QTY)
    )
    s = load(spark, sf_dir, "supplier")
    n = _nations(spark, sf_dir)
    return (
        shipped.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name", F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_excess_parts"),
            F.sum("total_qty").alias("sum_excess_qty"),
        )
    )


# --------------------------------------------------------------------------
# Q21: sole late supplier per waiting order
# --------------------------------------------------------------------------


@register(
    "sole_late_supplier_waits",
    oracle=f"""
    WITH per_order AS (
      SELECT l.l_orderkey,
        COUNT(DISTINCT l.l_suppkey) AS n_supp,
        COUNT(DISTINCT CASE WHEN l.l_shipdate >
          o.o_orderdate + INTERVAL {_Q21_LATE_DAYS} DAY
          THEN l.l_suppkey END) AS n_late,
        MAX(CASE WHEN l.l_shipdate >
          o.o_orderdate + INTERVAL {_Q21_LATE_DAYS} DAY
          THEN l.l_suppkey END) AS late_suppkey
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
      GROUP BY l.l_orderkey
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM per_order
    JOIN supplier s ON late_suppkey = s.s_suppkey
    WHERE n_supp >= 2 AND n_late = 1
    GROUP BY s.s_name
    """,
)
def sole_late_supplier_waits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on
    multi-supplier finished orders (shipdate > orderdate + 90d standing in
    for the missing receipt/commit dates).

    Q21's classic EXISTS / NOT EXISTS double self-join over lineitem is
    re-expressed as ONE grouped pass per order: count distinct suppliers,
    count distinct late suppliers, and capture the late supplier when it is
    unique — three aggregates over a single orderkey shuffle instead of
    three lineitem scans with two extra joins. The oracle keeps the same
    single-pass form (provably equivalent: n_late = 1 pins MAX to the one
    late supplier)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load(spark, sf_dir, "lineitem")
    late = F.col("l_shipdate") > F.expr(
        f"o_orderdate + INTERVAL {_Q21_LATE_DAYS} DAYS"
    )
    per_order = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("n_late"),
            F.max(F.when(late, F.col("l_suppkey"))).alias("late_suppkey"),
        )
        .filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_order.join(F.broadcast(s), F.col("late_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
