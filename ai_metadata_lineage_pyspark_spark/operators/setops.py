"""Set operations: INTERSECT / EXCEPT / UNION over keyed slices, and a
schema-evolving UNION ALL with missing-column fill.

The reference's example pipelines never union or intersect (SURVEY.md §2B
"set-ops absent"), but any engine claiming its query surface plus a
training-data pipeline needs audience algebra: "docs in snapshot A but not
B", "customers in both segments", "append two differently-shaped extracts".

Scale notes: Spark plans INTERSECT / EXCEPT as left-semi / left-anti hash
joins after aggregation — one shuffle per operand on the compared columns,
map-side partial distinct first. The tagged-bucket query reuses ONE scan of
each operand for all three buckets (the branches diverge after the
projection), and the union of the three buckets is a no-shuffle unionByName.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.io import load
from ..registry import register

_BAL_CENTS_MIN = 500_000  # 5 000.00 in cents
_STATUS = "F"


@register(
    "customer_audience_setops",
    oracle=f"""
    WITH rich AS (
      SELECT c_custkey FROM customer
      WHERE CAST(floor(c_acctbal * 100) AS BIGINT) >= {_BAL_CENTS_MIN}
    ), active AS (
      SELECT DISTINCT o_custkey AS c_custkey FROM orders
      WHERE o_orderstatus = '{_STATUS}'
    )
    SELECT 'both' AS bucket, c_custkey FROM (
      SELECT c_custkey FROM rich INTERSECT SELECT c_custkey FROM active)
    UNION ALL
    SELECT 'rich_only' AS bucket, c_custkey FROM (
      SELECT c_custkey FROM rich EXCEPT SELECT c_custkey FROM active)
    UNION ALL
    SELECT 'active_only' AS bucket, c_custkey FROM (
      SELECT c_custkey FROM active EXCEPT SELECT c_custkey FROM rich)
    """,
)
def customer_audience_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience algebra: customers with a high balance vs customers with a
    finished order, bucketed into INTERSECT / EXCEPT / reverse-EXCEPT with
    a tag. Balance compares in integer cents (exact across engines).

    Plan: each operand is ONE pruned scan (single key column reaches the
    parquet reader); intersect/except compile to semi/anti hash joins over
    the distinct keys — at 100 TB that is one key-shuffle per operand,
    reused across buckets by Spark's exchange reuse."""
    rich = (
        load(spark, sf_dir, "customer")
        .filter(F.floor(F.col("c_acctbal") * 100).cast("bigint") >= _BAL_CENTS_MIN)
        .select("c_custkey")
    )
    active = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == _STATUS)
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    tag = lambda df, name: df.select(  # noqa: E731
        F.lit(name).alias("bucket"), "c_custkey"
    )
    return (
        tag(rich.intersect(active), "both")
        .unionByName(tag(rich.subtract(active), "rich_only"))
        .unionByName(tag(active.subtract(rich), "active_only"))
    )


@register(
    "union_mixed_schema_feed",
    oracle="""
    SELECT * FROM (
      SELECT 'order' AS kind,
        o_orderkey AS ref_id,
        CAST(floor(o_totalprice * 100) AS BIGINT) AS amount_cents,
        CAST(NULL AS VARCHAR) AS event_type
      FROM orders WHERE o_orderpriority = '1-URGENT'
      UNION ALL
      SELECT 'event' AS kind,
        event_id AS ref_id,
        CAST(NULL AS BIGINT) AS amount_cents,
        event_type
      FROM events WHERE event_type IN ('purchase', 'signup')
    )
    """,
)
def union_mixed_schema_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolving append: two differently-shaped extracts (orders with
    an amount, events with a type) merged into one feed via
    ``unionByName(allowMissingColumns=True)`` — each side's missing column
    null-fills, mirroring a bronze-layer multi-source ingest.

    Plan: pure narrow union — zero shuffle; each side's filter and 2-3
    column projection is pushed to its scan."""
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(
            F.lit("order").alias("kind"),
            F.col("o_orderkey").alias("ref_id"),
            F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("amount_cents"),
        )
    )
    e = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "signup"))
        .select(
            F.lit("event").alias("kind"),
            F.col("event_id").alias("ref_id"),
            "event_type",
        )
    )
    return o.unionByName(e, allowMissingColumns=True)
