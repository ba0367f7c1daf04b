"""Data-quality validation operator (Deequ/Great-Expectations shape): a
declarative check suite evaluated engine-side, returning one row per check
with the violation count and a pass flag.

A training-data pipeline gates every ingest on checks like these (primary-
key uniqueness, referential integrity, domain and range constraints,
null-rate); the reference repo has no equivalent, but its north-star
pipeline needs one, so it's first-class here.

Scale design: all checks against one table fuse into a SINGLE aggregate
over that table — one scan, one map-side-combined agg row, regardless of
how many checks the suite holds. The only non-scalar check (foreign-key
orphans) is a left-anti join that shuffles just the two key columns; the
per-table scalar rows then unpivot driver-free via stack(). Nothing here
grows with table size except the scans themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.io import load
from ..registry import register

_EVENT_TYPES = "'click','view','purchase','signup','error'"


@register(
    "data_quality_checks",
    oracle=f"""
    SELECT check_name, table_name, violations, violations = 0 AS passed
    FROM (
      SELECT 'pk_unique_orderkey' AS check_name, 'orders' AS table_name,
        CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS violations
      FROM orders
      UNION ALL
      SELECT 'price_positive', 'orders',
        CAST(COUNT(*) FILTER (WHERE o_totalprice <= 0) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'status_domain', 'orders',
        CAST(COUNT(*) FILTER (WHERE o_orderstatus NOT IN ('O','F','P')) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'fk_orders_customer', 'orders',
        CAST(COUNT(*) AS BIGINT)
      FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
      UNION ALL
      SELECT 'quantity_range_1_50', 'lineitem',
        CAST(COUNT(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50) AS BIGINT)
      FROM lineitem
      UNION ALL
      SELECT 'discount_range_0_1', 'lineitem',
        CAST(COUNT(*) FILTER (WHERE l_discount < 0 OR l_discount > 1) AS BIGINT)
      FROM lineitem
      UNION ALL
      SELECT 'value_nonnull', 'events',
        CAST(COUNT(*) FILTER (WHERE value IS NULL) AS BIGINT)
      FROM events
      UNION ALL
      SELECT 'type_domain', 'events',
        CAST(COUNT(*) FILTER (WHERE event_type IS NULL
          OR event_type NOT IN ({_EVENT_TYPES})) AS BIGINT)
      FROM events
      UNION ALL
      SELECT 'text_nonempty', 'documents',
        CAST(COUNT(*) FILTER (WHERE text IS NULL OR length(text) = 0) AS BIGINT)
      FROM documents
      UNION ALL
      SELECT 'nchars_matches_text', 'documents',
        CAST(COUNT(*) FILTER (WHERE n_chars <> length(text)) AS BIGINT)
      FROM documents
    ) t
    """,
)
def data_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evaluate the check suite: per-table fused aggregates + one anti-join,
    unpivoted to (check_name, table_name, violations, passed) rows."""

    def unpivot(agg_df: DataFrame, table: str, checks: list[str]) -> DataFrame:
        # stack() the one-row aggregate into one row per check, JVM-side
        pairs = ", ".join(f"'{c}', {c}" for c in checks)
        return agg_df.selectExpr(
            f"stack({len(checks)}, {pairs}) AS (check_name, violations)"
        ).select(
            "check_name",
            F.lit(table).alias("table_name"),
            F.col("violations").cast("long").alias("violations"),
        )

    orders = load(spark, sf_dir, "orders")
    orders_agg = orders.agg(
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("pk_unique_orderkey"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias("price_positive"),
        F.count(F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1)).alias(
            "status_domain"
        ),
    )
    lineitem_agg = load(spark, sf_dir, "lineitem").agg(
        F.count(
            F.when((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1)
        ).alias("quantity_range_1_50"),
        F.count(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1)
        ).alias("discount_range_0_1"),
    )
    events_agg = load(spark, sf_dir, "events").agg(
        F.count(F.when(F.col("value").isNull(), 1)).alias("value_nonnull"),
        F.count(
            F.when(
                F.col("event_type").isNull()
                | ~F.col("event_type").isin("click", "view", "purchase", "signup", "error"),
                1,
            )
        ).alias("type_domain"),
    )
    docs_agg = load(spark, sf_dir, "documents").agg(
        F.count(
            F.when(F.col("text").isNull() | (F.length("text") == 0), 1)
        ).alias("text_nonempty"),
        F.count(F.when(F.col("n_chars") != F.length("text"), 1)).alias(
            "nchars_matches_text"
        ),
    )
    # referential integrity: orphaned order -> customer keys (left_anti
    # moves only the key columns through the shuffle)
    customers = load(spark, sf_dir, "customer").select("c_custkey")
    orphans = (
        orders.select("o_custkey")
        .join(customers, orders.o_custkey == customers.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("violations"))
        .select(
            F.lit("fk_orders_customer").alias("check_name"),
            F.lit("orders").alias("table_name"),
            F.col("violations").cast("long").alias("violations"),
        )
    )
    rows = (
        unpivot(orders_agg, "orders", ["pk_unique_orderkey", "price_positive", "status_domain"])
        .unionByName(orphans)
        .unionByName(
            unpivot(lineitem_agg, "lineitem", ["quantity_range_1_50", "discount_range_0_1"])
        )
        .unionByName(unpivot(events_agg, "events", ["value_nonnull", "type_domain"]))
        .unionByName(unpivot(docs_agg, "documents", ["text_nonempty", "nchars_matches_text"]))
    )
    return rows.withColumn("passed", F.col("violations") == 0)
