"""Pattern-mining and layout analytics: market-basket co-occurrence,
trailing-window anomaly scoring, and Z-order multi-dimensional layout keys.

Beyond-reference surface (the reference is an AST-lineage tool; these are
the classic warehouse-mining operations a curation/analytics stack layers on
top of the same tables — reference parity is the data model, not the ops).

Scale design notes (100 TB):

* `frequent_pair_mining` uses the collect-per-basket + array-combination
  shape, NOT an items×items self-join: per-order item lists are bounded
  (TPC-H ≤ 7 parts/order; the fixture ≤ 13), so the pair explosion is
  O(k²) with tiny k per basket, map-side after a single groupBy shuffle,
  and the pair aggregation is the only other shuffle. An items self-join
  would shuffle the full item table twice and is O(k²) anyway.
* `daily_revenue_anomaly` aggregates to one row per day BEFORE the window
  pass, so the window input is bounded by the calendar, not the fact
  table — a single-column ordered window over (days) rows is driver-scale
  no matter how big `orders` gets. Sums are exact BIGINT dollar units, so
  the trailing mean/std arithmetic is order-independent (double sums over
  a sliding frame would be engine- and algorithm-dependent: DuckDB uses
  segment trees for sliding aggregates, Spark a running fold).
* `zorder_layout` computes bit-interleaved Z-values with pure codegen bit
  arithmetic (no UDF); at scale the same key feeds
  `repartitionByRange(zval).sortWithinPartitions(zval)` before a parquet
  write so BOTH dimensions' min/max footer stats narrow per file — the
  standard multi-dim data-skipping layout. The query surfaces the
  per-bucket bounding boxes that make that pruning story auditable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.io import load
from ..registry import register

# ---------------------------------------------------------------------------
# frequent_pair_mining — parts that co-occur in the same order (market
# basket), support-thresholded, deterministic top-k.
# ---------------------------------------------------------------------------

_MIN_SUPPORT = 2
_PAIR_TOP_K = 100


@register(
    "frequent_pair_mining",
    oracle=f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             COUNT(*) AS support
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    )
    SELECT part_a, part_b, support
    FROM pairs
    WHERE support >= {_MIN_SUPPORT}
    ORDER BY support DESC, part_a, part_b
    LIMIT {_PAIR_TOP_K}
    """,
)
def frequent_pair_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top co-occurring part pairs across orders (frequent-itemset mining
    at itemset size 2, the workhorse of basket analysis / co-view mining).

    Spark shape: one groupBy(order) shuffle collecting the sorted distinct
    basket, pair expansion as a map-side higher-order array expression
    (flatten/transform/slice — all codegen, no UDF), then one pair-keyed
    aggregation with map-side combine. The oracle's self-join formulation
    is semantically identical but the basket-array form never materializes
    the quadratic blow-up off-heap per order > memory: k is basket-bounded.
    """
    items = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = items.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("parts")
    )
    # all i<j combinations of the sorted basket: struct(part_a, part_b)
    pair_expr = (
        "flatten(transform(parts, (x, i) ->"
        " transform(slice(parts, i + 2, size(parts)), y ->"
        " struct(x AS part_a, y AS part_b))))"
    )
    pairs = (
        baskets.select(F.explode(F.expr(pair_expr)).alias("p"))
        .select("p.part_a", "p.part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= _MIN_SUPPORT)
    )
    return pairs.orderBy(
        F.col("support").desc(), F.col("part_a").asc(), F.col("part_b").asc()
    ).limit(_PAIR_TOP_K)


# ---------------------------------------------------------------------------
# daily_revenue_anomaly — trailing-window z-score spike detection on the
# daily revenue series.
# ---------------------------------------------------------------------------

# exact whole-dollar units: floor of the same double is identical in both
# engines, and BIGINT sums are order-independent (see tpch.py _REV_SQL for
# the cent-precision variant). Squared terms (ss, sxy) are accumulated in
# DECIMAL(38,0): daily revenue ~9e9 at sf100 makes rev^2 ~8e19 > INT64 max,
# so a BIGINT sum-of-squares would silently wrap under Spark's non-ANSI
# arithmetic while DuckDB errors. DECIMAL(19,0)*DECIMAL(19,0) widens to
# DECIMAL(38,0) in BOTH engines (DuckDB caps multiply at p1+p2<=38), and
# the z/OLS formulas only ever read the statistic through CAST(.. AS
# DOUBLE). Cross-engine-identical rounding of that cast is guaranteed only
# while the accumulated decimal fits in an INT64 limb (|value| < 2^63):
# Spark's BigDecimal->double is correctly rounded, but DuckDB converts the
# backing hugeint in two steps (upper*2^64 + lower), which can double-round
# by 1 ulp once sums exceed ~1.8e19 — enough to flip a round(..., 6). The
# sf0.001..sf100 fixture range stays far under 2^63 for the WINDOWED stats
# here (<= 30-day trailing sums); a deployment aggregating whole-history
# squares at larger scale should keep the z/OLS comparison in DECIMAL (or
# quantize the statistic to fixed precision) before the double cast.
_DOLLARS = "CAST(floor(o_totalprice) AS BIGINT)"
_DEC = "DECIMAL(19,0)"  # per-term cast so the product lands in DECIMAL(38,0)
_ANOM_WINDOW = 7  # trailing days incl. current
_Z_SPIKE = 2.0


def _z_formula(rev: str, s: str, ss: str, n: str) -> str:
    """Sample z-score of `rev` within its trailing window, from exact
    integer (sum, sum-of-squares, count) — identical text in both engines
    so the double arithmetic evaluates in the same order."""
    mean = f"(CAST({s} AS DOUBLE) / CAST({n} AS DOUBLE))"
    var = (
        f"((CAST({ss} AS DOUBLE) - CAST({s} AS DOUBLE) * CAST({s} AS DOUBLE)"
        f" / CAST({n} AS DOUBLE)) / (CAST({n} AS DOUBLE) - 1.0))"
    )
    return (
        f"CASE WHEN {var} <= 0 THEN NULL"
        f" ELSE round((CAST({rev} AS DOUBLE) - {mean}) / sqrt({var}), 6) END"
    )


@register(
    "daily_revenue_anomaly",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM({_DOLLARS}) AS BIGINT) AS revenue_usd
      FROM orders GROUP BY 1
    ),
    winstats AS (
      SELECT day, revenue_usd,
        CAST(SUM(revenue_usd) OVER w AS BIGINT) AS s,
        SUM(CAST(revenue_usd AS {_DEC}) * CAST(revenue_usd AS {_DEC})) OVER w AS ss,
        COUNT(*) OVER w AS n
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN {_ANOM_WINDOW - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT day, revenue_usd,
      {_z_formula("revenue_usd", "s", "ss", "n")} AS zscore,
      COALESCE({_z_formula("revenue_usd", "s", "ss", "n")} > {_Z_SPIKE}, FALSE) AS is_spike
    FROM winstats
    WHERE n = {_ANOM_WINDOW}
    """,
)
def daily_revenue_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily revenue with a trailing-{7}-day z-score and spike flag.

    The fact table collapses to one row per calendar day before the window
    pass (the groupBy shuffle is the only data-sized stage); the ordered
    window then runs over a calendar-bounded series. Integer dollar sums
    make mean/std exact-input arithmetic, so the z-scores hash-match the
    oracle bit-for-bit after one final rounded double expression. The
    sum-of-squares runs in DECIMAL(38,0) (see _DEC above) so the trailing
    window never wraps BIGINT even at sf100+ daily volumes.
    """
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.expr("CAST(o_orderdate AS DATE)").alias("day"))
        .agg(F.sum(F.expr(_DOLLARS)).alias("revenue_usd"))
    )
    w = Window.orderBy("day").rowsBetween(-(_ANOM_WINDOW - 1), 0)
    z = _z_formula("revenue_usd", "s", "ss", "n")
    return (
        daily.withColumn("s", F.sum("revenue_usd").over(w))
        .withColumn(
            "ss",
            F.sum(
                F.expr(f"CAST(revenue_usd AS {_DEC}) * CAST(revenue_usd AS {_DEC})")
            ).over(w),
        )
        .withColumn("n", F.count(F.lit(1)).over(w))
        .where(F.col("n") == _ANOM_WINDOW)
        .select(
            "day",
            "revenue_usd",
            F.expr(z).alias("zscore"),
            F.coalesce(F.expr(z) > F.lit(_Z_SPIKE), F.lit(False)).alias("is_spike"),
        )
    )


# ---------------------------------------------------------------------------
# zorder_layout — bit-interleaved Z-values over (customer, order-day) and
# the per-bucket bounding boxes a Z-ordered file layout would give parquet
# data skipping on BOTH dimensions.
# ---------------------------------------------------------------------------

_Z_BITS = 16
# fixed z-range width per bucket (2^18 cells = 512x512 in dim units), so
# bucket count grows with the populated key domain instead of pinning a
# fixed 64 buckets that degenerate to 1 at small scale factors
_Z_BUCKET_SHIFT = 18
_Z_EPOCH = "1995-01-01"


def _interleave_terms(a: str, b: str, shift_fn) -> str:
    """Σ_i ((a>>i)&1)<<2i | ((b>>i)&1)<<2i+1 as engine-specific SQL text."""
    terms = []
    for i in range(_Z_BITS):
        terms.append(shift_fn(a, i, 2 * i))
        terms.append(shift_fn(b, i, 2 * i + 1))
    return " + ".join(terms)


def _spark_term(col: str, i: int, pos: int) -> str:
    return f"shiftleft(shiftright({col}, {i}) & 1, {pos})"


def _duck_term(col: str, i: int, pos: int) -> str:
    return f"((({col} >> {i}) & 1) << {pos})"


_ZO_DIMS_SPARK = (
    "o_custkey & 65535",
    f"datediff(CAST(o_orderdate AS DATE), DATE '{_Z_EPOCH}') & 65535",
)
_ZO_DIMS_DUCK = (
    "o_custkey & 65535",
    f"datediff('day', DATE '{_Z_EPOCH}', CAST(o_orderdate AS DATE)) & 65535",
)


@register(
    "zorder_layout",
    oracle=f"""
    WITH dims AS (
      SELECT CAST({_ZO_DIMS_DUCK[0]} AS BIGINT) AS cust_lo,
             CAST({_ZO_DIMS_DUCK[1]} AS BIGINT) AS day_off
      FROM orders
    ),
    z AS (
      SELECT cust_lo, day_off,
        CAST({_interleave_terms("cust_lo", "day_off", _duck_term)} AS BIGINT) AS zval
      FROM dims
    )
    SELECT CAST(zval >> {_Z_BUCKET_SHIFT} AS BIGINT) AS bucket,
      CAST(COUNT(*) AS BIGINT) AS n_orders,
      MIN(cust_lo) AS min_cust, MAX(cust_lo) AS max_cust,
      MIN(day_off) AS min_day, MAX(day_off) AS max_day,
      CAST((MAX(cust_lo) - MIN(cust_lo) + 1) * (MAX(day_off) - MIN(day_off) + 1)
        AS BIGINT) AS bbox_area
    FROM z
    GROUP BY 1
    """,
)
def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout keys over (o_custkey, order-day) plus the
    per-bucket bounding box each fixed-width layout bucket (2^18 Z-cells,
    i.e. a 512×512 dim-unit tile; bucket count grows with the populated
    key domain — ~150 at sf0.1) would carry as parquet min/max stats.

    A linear sort clusters one dimension and scatters the other; the
    interleaved Z-value keeps both bounding-box edges ~√bucket-sized, which
    is exactly what lets a scan prune on EITHER predicate dimension. The
    interleave is 32 shift-and-mask codegen terms — no UDF, no shuffle
    beyond the final 64-row rollup. The layout write itself is
    `df.repartitionByRange(N, "zval").sortWithinPartitions("zval")` ahead
    of a parquet sink; this query audits the clustering quality
    (bbox_area ≪ full-domain area) that write would produce.
    """
    dims = load(spark, sf_dir, "orders").select(
        F.expr(f"CAST({_ZO_DIMS_SPARK[0]} AS BIGINT)").alias("cust_lo"),
        F.expr(f"CAST({_ZO_DIMS_SPARK[1]} AS BIGINT)").alias("day_off"),
    )
    zed = dims.withColumn(
        "zval",
        F.expr(f"CAST({_interleave_terms('cust_lo', 'day_off', _spark_term)} AS BIGINT)"),
    )
    return zed.groupBy(
        F.expr(f"CAST(zval >> {_Z_BUCKET_SHIFT} AS BIGINT)").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("cust_lo").alias("min_cust"),
        F.max("cust_lo").alias("max_cust"),
        F.min("day_off").alias("min_day"),
        F.max("day_off").alias("max_day"),
        F.expr(
            "CAST((MAX(cust_lo) - MIN(cust_lo) + 1) * (MAX(day_off) - MIN(day_off) + 1)"
            " AS BIGINT)"
        ).alias("bbox_area"),
    )


# ---------------------------------------------------------------------------
# graph_triangle_count — triangle census of the part co-occurrence graph
# (parts linked when bought together in >= _MIN_SUPPORT orders): the
# classic graph-cohesion statistic behind clustering-coefficient and
# community-quality metrics.
# ---------------------------------------------------------------------------


@register(
    "graph_triangle_count",
    oracle=f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    edges AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= {_MIN_SUPPORT}
    ),
    tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM edges e1
      JOIN edges e2 ON e2.u = e1.v
      JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles,
      CAST((SELECT COUNT(*) FROM edges) AS BIGINT) AS n_edges,
      CAST((SELECT COUNT(DISTINCT u) + COUNT(DISTINCT v)
            FROM edges) AS BIGINT) AS n_endpoint_slots,
      MIN(a) AS min_vertex
    FROM tri
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count over the support-thresholded co-purchase graph:
    edges are canonically oriented (u < v), so each triangle a<b<c is
    enumerated exactly once as (a-b) ⋈ (b-c) ⋈ (a-c) — the standard
    distributed triangle-join with no post-hoc dedup.

    Scale shape: the edge list (support >= {2} pairs) is orders of
    magnitude smaller than the fact table; both triangle joins key on a
    vertex, so they shuffle edge-sized data twice. At web scale the same
    plan adds the degree-ordering trick (orient edges low-degree ->
    high-degree) to bound the skew of hub vertices; the fixture graph's
    degrees are support-thresholded small."""
    items = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = items.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("parts")
    )
    pair_expr = (
        "flatten(transform(parts, (x, i) ->"
        " transform(slice(parts, i + 2, size(parts)), y ->"
        " struct(x AS u, y AS v))))"
    )
    edges = (
        baskets.select(F.explode(F.expr(pair_expr)).alias("p"))
        .select("p.u", "p.v")
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= _MIN_SUPPORT)
        .select("u", "v")
    )
    e1 = edges.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = edges.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = edges.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    counts = tri.agg(
        F.count(F.lit(1)).alias("n_triangles"), F.min("a").alias("min_vertex")
    )
    edge_stats = edges.agg(
        F.count(F.lit(1)).alias("n_edges"),
        (F.countDistinct("u") + F.countDistinct("v")).alias("n_endpoint_slots"),
    )
    return counts.crossJoin(edge_stats).select(
        "n_triangles", "n_edges", "n_endpoint_slots", "min_vertex"
    )


# ---------------------------------------------------------------------------
# revenue_trend_fit — exact-integer ordinary-least-squares fit of the
# daily revenue series: distributed regression where every sufficient
# statistic is a BIGINT sum, so the fitted line is engine-exact.
# ---------------------------------------------------------------------------


@register(
    "revenue_trend_fit",
    oracle=f"""
    WITH daily AS (
      SELECT datediff('day', DATE '{_Z_EPOCH}', CAST(o_orderdate AS DATE)) AS x,
             CAST(SUM({_DOLLARS}) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(x) AS BIGINT) AS sx,
        CAST(SUM(y) AS BIGINT) AS sy,
        CAST(SUM(x * x) AS BIGINT) AS sxx,
        SUM(CAST(x AS {_DEC}) * CAST(y AS {_DEC})) AS sxy_dec
      FROM daily
    )
    SELECT n, sx, sy, sxx, TRY_CAST(sxy_dec AS BIGINT) AS sxy,
      round((CAST(n AS DOUBLE) * CAST(sxy_dec AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
        AS slope_usd_per_day,
      round((CAST(sy AS DOUBLE) - ((CAST(n AS DOUBLE) * CAST(sxy_dec AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
             * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS intercept_usd
    FROM s
    """,
)
def revenue_trend_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form OLS over the daily revenue series: slope and intercept
    from the five sufficient statistics (n, Σx, Σy, Σx², Σxy), every one
    an exact integer sum (Σxy in DECIMAL(38,0) — x·y clears INT64 around
    sf10⁵, see _DEC; the output column is the BIGINT projection, which goes
    loudly NULL rather than silently wrapping if that bound is ever passed)
    — so unlike iterative float regression, the
    distributed fit is bit-identical across engines AND partitionings. The
    final slope/intercept are single deterministic double expressions over
    those integers, rounded once at the boundary.

    Scale shape: the fact table collapses to calendar cardinality first
    (one partial-agg shuffle); the sufficient statistics reduce those
    day-rows to ONE row with map-side combine. This is the model for any
    closed-form distributed fit (OLS, means/covariances, Naive Bayes
    counts): ship integer sums, never rows."""
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.expr(
                f"datediff(CAST(o_orderdate AS DATE), DATE '{_Z_EPOCH}')"
            ).alias("x")
        )
        .agg(F.sum(F.expr(_DOLLARS)).alias("y"))
    )
    s = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("x * x")).alias("sxx"),
        F.sum(F.expr(f"CAST(x AS {_DEC}) * CAST(y AS {_DEC})")).alias("sxy_dec"),
    )
    slope = (
        "(CAST(n AS DOUBLE) * CAST(sxy_dec AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
        " / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    )
    return s.select(
        "n",
        "sx",
        "sy",
        "sxx",
        F.expr("CAST(sxy_dec AS BIGINT)").alias("sxy"),
        F.expr(f"round({slope}, 6)").alias("slope_usd_per_day"),
        F.expr(
            f"round((CAST(sy AS DOUBLE) - ({slope}) * CAST(sx AS DOUBLE))"
            " / CAST(n AS DOUBLE), 6)"
        ).alias("intercept_usd"),
    )
