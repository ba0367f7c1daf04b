"""Scalar / projection / filter / join / SQL-CTE operator surface.

Mirrors the reference's modeled pipeline capabilities (SURVEY.md §2B;
reference citations in each docstring) re-phrased over the fixture tables.
Everything here is pure built-in-function DataFrame/SQL code — whole-stage
codegen end to end, no Python UDFs, so plans scale by partitioning alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.io import ensure_engine_confs, load
from ..registry import register

# ---------------------------------------------------------------------------
# bronze_orders_cleanup — script_01_bronze_ingest_orders.py:12-22 semantics:
# casts, to_date, coalesce+lit defaults, upper/lower, multi-branch when,
# abs. (CSV ingest options are exercised in tests/test_sources.py; here the
# scan is parquet so filters/pruning push down.)
# ---------------------------------------------------------------------------


@register(
    "bronze_orders_cleanup",
    oracle="""
    SELECT
      CAST(o_orderkey AS VARCHAR) AS order_id,
      CAST(o_custkey AS VARCHAR)  AS customer_id,
      CAST(o_orderdate AS DATE)   AS order_date,
      CASE WHEN o_orderstatus = 'F' THEN -o_totalprice ELSE o_totalprice END AS amount,
      UPPER(COALESCE(NULLIF(o_orderpriority, ''), 'none')) AS priority_code,
      LOWER(COALESCE(o_orderstatus, 'unknown')) AS channel,
      CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS is_refund,
      ABS(CASE WHEN o_orderstatus = 'F' THEN -o_totalprice ELSE o_totalprice END) AS abs_amount
    FROM orders
    """,
)
def bronze_orders_cleanup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    amount = F.when(F.col("o_orderstatus") == "F", -F.col("o_totalprice")).otherwise(
        F.col("o_totalprice")
    )
    return orders.select(
        F.col("o_orderkey").cast("string").alias("order_id"),
        F.col("o_custkey").cast("string").alias("customer_id"),
        F.to_date("o_orderdate").alias("order_date"),
        amount.alias("amount"),
        F.upper(F.coalesce(F.nullif(F.col("o_orderpriority"), F.lit("")), F.lit("none"))).alias(
            "priority_code"
        ),
        F.lower(F.coalesce(F.col("o_orderstatus"), F.lit("unknown"))).alias("channel"),
        F.when(F.col("o_orderstatus") == "F", F.lit(1)).otherwise(F.lit(0)).alias("is_refund"),
        F.abs(amount).alias("abs_amount"),
    )


# ---------------------------------------------------------------------------
# orders_customer_join — script_03_fact_orders_enriched.py:7-20: df.alias +
# left equi-join with expression condition + qualified-column select.
# customer is small relative to orders -> explicit broadcast hint (at 100 TB
# orders this is the difference between a shuffle join and a map-side join).
# ---------------------------------------------------------------------------


@register(
    "orders_customer_join",
    oracle="""
    SELECT
      o.o_orderkey   AS order_id,
      o.o_custkey    AS customer_id,
      c.c_name       AS customer_name,
      c.c_mktsegment AS customer_segment,
      c.c_acctbal    AS customer_acctbal,
      CAST(o.o_orderdate AS DATE) AS order_date,
      o.o_orderstatus AS order_status,
      o.o_totalprice  AS amount
    FROM orders o
    LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def orders_customer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").alias("o")
    customer = F.broadcast(load(spark, sf_dir, "customer").alias("c"))
    return orders.join(
        customer, F.col("o.o_custkey") == F.col("c.c_custkey"), "left"
    ).select(
        F.col("o.o_orderkey").alias("order_id"),
        F.col("o.o_custkey").alias("customer_id"),
        F.col("c.c_name").alias("customer_name"),
        F.col("c.c_mktsegment").alias("customer_segment"),
        F.col("c.c_acctbal").alias("customer_acctbal"),
        F.to_date("o.o_orderdate").alias("order_date"),
        F.col("o.o_orderstatus").alias("order_status"),
        F.col("o.o_totalprice").alias("amount"),
    )


# ---------------------------------------------------------------------------
# dim_part_sql_cte — script_04_dim_product_sql_cte.py:12-44: multi-CTE SQL
# (cleaned -> metrics -> SELECT), CAST/TRIM/LOWER/UPPER/COALESCE, guarded
# division, CASE normalization. Run through spark.sql on a temp view so the
# SQL front-end path is exercised, not just the DataFrame DSL.
# ---------------------------------------------------------------------------

_DIM_PART_SQL = """
WITH cleaned AS (
  SELECT
    CAST(p_partkey AS {string_t}) AS product_id,
    LOWER(TRIM(p_type))  AS category,
    UPPER(COALESCE(p_brand, 'NOBRAND')) AS brand,
    CAST(p_size AS INT) AS size,
    CASE WHEN p_retailprice IS NULL OR p_retailprice <= 0 THEN 0 ELSE p_retailprice END AS price_norm,
    ROUND(p_retailprice * 0.6, 2) AS cost
  FROM part
),
metrics AS (
  SELECT
    product_id, category, brand, size, price_norm, cost,
    (price_norm - cost) AS unit_margin,
    CASE WHEN price_norm = 0 THEN NULL
         ELSE ROUND((price_norm - cost) / price_norm, 6) END AS margin_pct
  FROM metrics_src
)
SELECT product_id, category, brand, size, price_norm, cost,
       ROUND(unit_margin, 2) AS unit_margin, margin_pct
FROM metrics
"""


def _dim_part_sql(string_t: str) -> str:
    # one source CTE name; Spark and DuckDB both allow referencing the prior CTE
    return _DIM_PART_SQL.replace("metrics_src", "cleaned").format(string_t=string_t)


@register("dim_part_sql_cte", oracle=_dim_part_sql("VARCHAR"))
def dim_part_sql_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_engine_confs(spark)
    load(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(_dim_part_sql("STRING"))


# ---------------------------------------------------------------------------
# json_props_parse — semi-structured column handling: parse the events
# `props` JSON into a typed struct, bucket by the extracted field. At scale
# from_json runs in whole-stage codegen (Jackson in the JVM) — never a
# Python UDF for JSON.
# ---------------------------------------------------------------------------


@register(
    "json_props_parse",
    oracle="""
    SELECT
      CAST(json_extract(props, '$.k') AS INT) // 10 AS k_decile,
      event_type,
      COUNT(*) AS n_events,
      MIN(CAST(json_extract(props, '$.k') AS INT)) AS min_k,
      MAX(CAST(json_extract(props, '$.k') AS INT)) AS max_k
    FROM events
    WHERE props IS NOT NULL
    GROUP BY 1, 2
    """,
)
def json_props_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    parsed = events.filter(F.col("props").isNotNull()).withColumn(
        "k", F.from_json("props", "k INT").getField("k")
    )
    return (
        parsed.groupBy(
            # floor() matches DuckDB's `//` (floor division) for negative k
            # too; the previous `/ 10 cast int` truncated toward zero
            F.floor(F.col("k") / 10).cast("int").alias("k_decile"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


# ---------------------------------------------------------------------------
# event_type_pivot — PIVOT: long -> wide reshape (one column per event type).
# Spark's pivot with an EXPLICIT value list compiles to a single groupBy with
# conditional aggregates — one shuffle, map-side partial agg. Omitting the
# value list would trigger an extra distinct-scan job to discover the
# columns; at 100 TB always pin the list. Oracle replays the same shape with
# CASE-WHEN sums (the relational definition of pivot).
# ---------------------------------------------------------------------------

_EVENT_TYPES = ("click", "view", "purchase", "signup", "error")


@register(
    "event_type_pivot",
    oracle=f"""
    SELECT user_id,
      {", ".join(
        f"CAST(COUNT(CASE WHEN event_type = '{t}' THEN 1 END) AS BIGINT) AS n_{t}"
        for t in _EVENT_TYPES
      )}
    FROM events
    GROUP BY user_id
    """,
)
def event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type counts as wide columns via pivot with a pinned
    value list (no discovery scan)."""
    events = load(spark, sf_dir, "events")
    wide = (
        events.groupBy("user_id")
        .pivot("event_type", list(_EVENT_TYPES))
        .count()
    )
    # pivot-count yields null for absent combinations; the relational
    # definition counts zero
    return wide.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in _EVENT_TYPES],
    )


# ---------------------------------------------------------------------------
# orders_rollup_subtotals — GROUPING SETS / ROLLUP: hierarchical subtotals
# (status x priority, per-status, grand total) in ONE aggregation pass over
# the fact table instead of three scans unioned. grouping() flags
# disambiguate real NULL keys from subtotal rows.
# ---------------------------------------------------------------------------


@register(
    "orders_rollup_subtotals",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
      COUNT(*) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
      CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
      CAST(GROUPING(o_orderpriority) AS INT) AS g_priority
    FROM orders
    GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
)
def orders_rollup_subtotals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(status, priority): detail rows + per-status subtotals + grand
    total from one pass; grouping() marks the subtotal levels."""
    orders = load(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_price"),
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_priority"),
    )


# ---------------------------------------------------------------------------
# Anti / semi joins — existence predicates as joins that never materialize
# the matched side: a semi join carries each left row at most once (no
# fan-out on duplicate matches), an anti join keeps only unmatched rows.
# Both shuffle once on the key like an inner join but move strictly less
# data — at 100 TB, EXISTS/NOT EXISTS phrased as inner join + distinct is
# the classic accidental-blowup these operators exist to avoid.
# ---------------------------------------------------------------------------


@register(
    "customers_without_urgent_orders",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment, c.c_acctbal
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    """,
)
def customers_without_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS via left_anti join: customers with no URGENT order. The
    priority filter lands on the orders scan BEFORE the anti join, so the
    join's build side is the filtered subset, not the whole fact table."""
    customer = load(spark, sf_dir, "customer")
    urgent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return customer.join(
        urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_mktsegment", "c_acctbal")


@register(
    "parts_ordered_semi",
    oracle="""
    SELECT p.p_partkey, p.p_brand, p.p_size
    FROM part p
    WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
    """,
)
def parts_ordered_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS via left_semi join: parts that appear in at least one
    lineitem — each part emitted once regardless of how many lineitems
    match (no fan-out, unlike inner join + distinct)."""
    part = load(spark, sf_dir, "part")
    lineitem = load(spark, sf_dir, "lineitem")
    return part.join(
        lineitem, F.col("p_partkey") == F.col("l_partkey"), "left_semi"
    ).select("p_partkey", "p_brand", "p_size")


# ---------------------------------------------------------------------------
# orders_unpivot_metrics — wide -> long reshaping via the unpivot/melt API.
# ---------------------------------------------------------------------------


@register(
    "orders_unpivot_metrics",
    oracle="""
    WITH wide AS (
      SELECT o_orderstatus,
        COUNT(*) AS n_orders,
        CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
          AS total_price_c,
        CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
      FROM orders
      GROUP BY o_orderstatus
    )
    SELECT o_orderstatus, metric, value
    FROM wide
    UNPIVOT (value FOR metric IN (n_orders, total_price_c, n_customers))
    """,
)
def orders_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long reshaping with DataFrame.unpivot (a.k.a. melt): one
    aggregated row per status becomes one row per (status, metric). The
    inverse of event_type_pivot, completing the reshape pair. Unpivot is a
    per-row expand (no shuffle beyond the feeding aggregate); the metric
    list is pinned, so the schema is static — no discovery scan."""
    wide = (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)")).alias(
                "total_price_c"
            ),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
    )
    return wide.unpivot(
        ids=["o_orderstatus"],
        values=["n_orders", "total_price_c", "n_customers"],
        variableColumnName="metric",
        valueColumnName="value",
    )


# ---------------------------------------------------------------------------
# join_strategy_hints — explicit join-strategy control via hints.
# ---------------------------------------------------------------------------


@register(
    "join_strategy_hints",
    oracle="""
    SELECT n.n_name AS nation, COUNT(*) AS n_suppliers,
      CAST(SUM(CAST(floor(s.s_acctbal * 100) AS BIGINT)) AS BIGINT)
        AS acctbal_c
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY nation
    """,
)
def join_strategy_hints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-strategy hint API: the same supplier⋈nation rollup with an
    explicit SHUFFLE_HASH hint overriding the planner's broadcast choice.

    Hints are how a pipeline pins a strategy when statistics mislead the
    optimizer (e.g. a "small" side that explodes after a filter is removed,
    or a broadcast that would OOM executors at 100 TB). Results must be
    strategy-invariant — the oracle is the plain join. A plan assertion in
    tests/test_plans.py verifies the hint actually took effect."""
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").hint("shuffle_hash")
    return (
        s.join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum(F.expr("CAST(floor(s_acctbal * 100) AS BIGINT)")).alias(
                "acctbal_c"
            ),
        )
    )


# ---------------------------------------------------------------------------
# safe_expression_audit — error-safe expression family (try_divide/try_cast).
# ---------------------------------------------------------------------------


@register(
    "safe_expression_audit",
    oracle="""
    WITH checked AS (
      SELECT o_orderkey,
        CASE WHEN o_custkey % 7 = 0 THEN NULL
             ELSE CAST(floor(o_totalprice * 100) AS BIGINT) / (o_custkey % 7)
        END AS per_bucket_price,
        TRY_CAST(o_orderpriority AS INTEGER) AS bad_cast
      FROM orders
    )
    SELECT
      COUNT(*) AS n_rows,
      CAST(SUM(CASE WHEN per_bucket_price IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS n_div_null,
      CAST(SUM(CASE WHEN bad_cast IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS n_cast_null,
      CAST(SUM(CAST(floor(per_bucket_price) AS BIGINT)) AS BIGINT)
        AS sum_floor_price
    FROM checked
    """,
)
def safe_expression_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expression family: try_divide yields NULL on a zero
    divisor and try_cast on a malformed value, instead of failing the job —
    the ANSI-mode-safe way to keep a 100 TB pipeline running through dirty
    rows while COUNTing exactly what was nulled for the audit trail.

    Cross-engine note: the oracle expresses try_divide as a CASE guard
    (DuckDB's x/0 semantics differ) — the observable contract (NULL on bad
    input) is identical. The division result is floored to an exact BIGINT
    before summing so the audit total hash-matches."""
    o = load(spark, sf_dir, "orders")
    checked = o.select(
        "o_orderkey",
        F.try_divide(
            F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)"),
            F.col("o_custkey") % 7,
        ).alias("per_bucket_price"),
        # try_cast, not try_to_number('99999'): the format-based parse only
        # agrees with the oracle's TRY_CAST on values that fail BOTH parses
        # (e.g. ' 123 ' or '+5' diverge) — model the same conversion as the
        # oracle so the audit holds off-fixture too
        F.expr("try_cast(o_orderpriority AS INT)").alias("bad_cast"),
    )
    return checked.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("per_bucket_price").isNull().cast("long")).alias("n_div_null"),
        F.sum(F.col("bad_cast").isNull().cast("long")).alias("n_cast_null"),
        F.sum(F.expr("CAST(floor(per_bucket_price) AS BIGINT)")).alias(
            "sum_floor_price"
        ),
    )


# ---------------------------------------------------------------------------
# variant_props_extract — the Spark 4 VARIANT path over the same JSON props
# column json_props_parse reads with from_json: parse once into the binary
# VARIANT encoding, extract typed fields with variant_get. At 100 TB this is
# the semi-structured design of record — VARIANT keeps shredded binary
# (no per-row re-parse per extracted field, unlike repeated
# get_json_object calls) while staying schema-on-read for evolving props.
# ---------------------------------------------------------------------------


@register(
    "variant_props_extract",
    oracle="""
    SELECT event_type,
      CAST(COUNT(*) AS BIGINT) AS n_events,
      CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT)
        AS sum_k,
      MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
      MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k,
      CAST(COUNT(*) FILTER (
        WHERE json_extract_string(props, '$.missing') IS NULL) AS BIGINT)
        AS n_missing_path
    FROM events
    WHERE props IS NOT NULL
    GROUP BY event_type
    """,
)
def variant_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed field extraction through the VARIANT type (Spark 4):
    `parse_json` shreds the props JSON into the binary variant encoding
    once, `variant_get` pulls `$.k` as INT and probes a missing path
    (NULL, not an error — the schema-on-read contract). The DuckDB oracle
    expresses the identical semantics through its JSON type, so the
    VARIANT path's values — including missing-path NULL behavior — are
    hash-checked, not just type-checked.

    Plan note: parse_json is evaluated once per row in the projection and
    both variant_get extractions read the same shredded value; the rollup
    is an ordinary partial-agg groupBy. The json_props_parse twin keeps
    the from_json(struct) form for comparison — VARIANT wins when props
    schemas drift faster than pipelines redeploy."""
    events = load(spark, sf_dir, "events")
    parsed = events.filter(F.col("props").isNotNull()).select(
        "event_type", F.parse_json("props").alias("v")
    )
    shaped = parsed.select(
        "event_type",
        F.variant_get("v", "$.k", "int").alias("k"),
        F.variant_get("v", "$.missing", "string").alias("missing"),
    )
    return shaped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.count(F.when(F.col("missing").isNull(), 1)).alias("n_missing_path"),
    )


# ---------------------------------------------------------------------------
# observed_ingest_metrics — the Spark Observation API (pyspark.sql
# .Observation, Spark 3.3+/4): named aggregate metrics attached to a scan
# and harvested from the SAME job that runs the real query — the built-in
# mechanism for data-quality counters that otherwise cost a second full
# pass (or a rain of accumulators). At 100 TB an ingest audit that re-scans
# the table doubles the bill; .observe() rides the existing shuffle's map
# side for free.
#
# The registered row runs the downstream rollup (events per type + cents)
# as the observed action, then emits rollup x audit — both products of ONE
# scan. The per-type rows are collected on the driver to splice the
# observation in; the rollup is event_type-cardinality (single digits), the
# same bounded-collect class as the lineage evidence caps (README.md).
# ---------------------------------------------------------------------------


@register(
    "observed_ingest_metrics",
    oracle="""
    WITH roll AS (
      SELECT event_type,
        COUNT(*) AS n_events,
        CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS type_cents
      FROM events GROUP BY event_type
    ), aud AS (
      SELECT COUNT(*) AS n_rows,
        CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents_total,
        COUNT(*) FILTER (WHERE value IS NULL) AS n_null_value
      FROM events
    )
    SELECT roll.event_type, roll.n_events, roll.type_cents,
      aud.n_rows, aud.cents_total, aud.n_null_value
    FROM roll CROSS JOIN aud
    """,
)
def observed_ingest_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass ingest audit via Observation (module note above): attach
    {n_rows, cents_total, n_null_value} to the events scan, run the
    per-type rollup as the observed action, and return rollup rows with the
    audit columns spliced in. The audit aggregates ride the rollup job —
    no second scan of events happens at any point."""
    from pyspark.sql import Observation, Row

    events = load(spark, sf_dir, "events")
    obs = Observation("ingest_audit")
    observed = events.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.expr("CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)").alias(
            "cents_total"
        ),
        F.count(F.when(F.col("value").isNull(), 1)).alias("n_null_value"),
    )
    rollup_rows = (
        observed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr("CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)").alias(
                "type_cents"
            ),
        )
        .collect()  # the one action: populates obs.get AND yields the rollup
    )
    audit = obs.get
    return spark.createDataFrame(
        [
            Row(
                event_type=r["event_type"],
                n_events=r["n_events"],
                type_cents=r["type_cents"],
                n_rows=audit["n_rows"],
                cents_total=audit["cents_total"],
                n_null_value=audit["n_null_value"],
            )
            for r in rollup_rows
        ],
        schema="event_type string, n_events bigint, type_cents bigint, "
        "n_rows bigint, cents_total bigint, n_null_value bigint",
    )


# ---------------------------------------------------------------------------
# key_skew_histogram — shuffle-key skew diagnostic (r8): the census a
# platform runs on a join/agg key BEFORE deciding between plain hash
# partitioning, salting, and AQE skew-join. Keys are bucketed by
# floor(log2(rows-per-key)); each bucket reports how many keys it holds
# and what share of total rows they carry — a heavy bucket with few keys
# is exactly the salting trigger. (The salted twin this feeds is
# skew_salted_user_rollup.)
#
# Scale: one key-keyed shuffle with map-side partial count (the same
# exchange the diagnosed join itself would do), then a bucket rollup over
# the key-cardinality table and one broadcast single-row totals join.
# floor(log2(c)) is safe cross-engine: log2 is exact on powers of two and
# non-powers cannot land on an integer, so the floor cannot straddle ULPs.
# ---------------------------------------------------------------------------


@register(
    "key_skew_histogram",
    oracle="""
    WITH per_key AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY user_id
    ),
    bucketed AS (
      SELECT CAST(floor(log2(c)) AS BIGINT) AS log2_bucket, c FROM per_key
    ),
    tot AS (
      SELECT CAST(SUM(c) AS BIGINT) AS total_rows,
             CAST(COUNT(*) AS BIGINT) AS total_keys
      FROM per_key
    )
    SELECT b.log2_bucket,
      CAST(COUNT(*) AS BIGINT) AS n_keys,
      CAST(SUM(b.c) AS BIGINT) AS n_rows,
      CAST(MAX(b.c) AS BIGINT) AS max_rows_per_key,
      CAST(SUM(b.c) * 1000000 // t.total_rows AS BIGINT) AS rows_share_ppm,
      CAST(COUNT(*) * 1000000 // t.total_keys AS BIGINT) AS keys_share_ppm
    FROM bucketed b CROSS JOIN tot t
    GROUP BY b.log2_bucket, t.total_rows, t.total_keys
    """,
)
def key_skew_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """log2-bucketed rows-per-key histogram of the events join key
    (module note above): per bucket, key count, row volume, the largest
    key, and integer-ppm shares of total rows/keys."""
    per_key = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = per_key.agg(
        F.sum("c").cast("long").alias("total_rows"),
        F.count(F.lit(1)).cast("long").alias("total_keys"),
    )
    return (
        per_key.select(
            F.expr("CAST(floor(log2(c)) AS BIGINT)").alias("log2_bucket"), "c"
        )
        .crossJoin(F.broadcast(tot))
        .groupBy("log2_bucket", "total_rows", "total_keys")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("c").cast("long").alias("n_rows"),
            F.max("c").cast("long").alias("max_rows_per_key"),
        )
        .select(
            "log2_bucket",
            "n_keys",
            "n_rows",
            "max_rows_per_key",
            F.expr("CAST(n_rows * 1000000 DIV total_rows AS BIGINT)").alias(
                "rows_share_ppm"
            ),
            F.expr("CAST(n_keys * 1000000 DIV total_keys AS BIGINT)").alias(
                "keys_share_ppm"
            ),
        )
    )
