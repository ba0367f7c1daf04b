"""Deterministic distinct-count sketch: KMV (k-minimum-values).

approx_count_distinct's HLL++ sketch is engine-specific, so it can never be
oracle-checked value-for-value. KMV gives the same one-pass / bounded-memory
/ mergeable properties with a fully deterministic definition: hash each
value to [0,1) with md5, keep the k smallest distinct hashes per group, and
estimate |D| as (k-1)/h_(k) (the classic KMV estimator). Both engines
replay the identical md5-derived hashes, so the estimate is exactly
reproducible — the correct design for any pipeline that must audit its own
sketches.

Scale shape: dedup (group, value) -> per-group k-smallest via a rank
window -> tiny per-group rollup. The window sorts only within each group's
partition; sketch state is O(k) per group. The exact distinct count is
carried alongside purely to expose the estimator's error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.io import load
from ..registry import register

_K = 64

# md5-derived uniform hash in [0, 1): identical expression in both engines.
_H_SPARK = (
    "cast(conv(substr(md5(cast(user_id as string)), 1, 8), 16, 10) as double)"
    " / 4294967296.0"
)
_H_SQL = (
    "CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS DOUBLE)"
    " / 4294967296.0"
)


@register(
    "kmv_distinct_sketch",
    oracle=f"""
    WITH d AS (
      SELECT DISTINCT event_type, user_id FROM events
    ),
    h AS (
      SELECT event_type, {_H_SQL} AS h FROM d
    ),
    r AS (
      SELECT event_type, h,
        ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM h
    )
    SELECT event_type,
      COUNT(*) AS n_distinct_exact,
      MAX(CASE WHEN rn = {_K} THEN h END) AS kth_min_hash,
      CASE WHEN COUNT(*) <= {_K} THEN CAST(COUNT(*) AS DOUBLE)
           ELSE ({_K} - 1) / MAX(CASE WHEN rn = {_K} THEN h END)
      END AS kmv_estimate
    FROM r
    GROUP BY event_type
    """,
)
def kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct-user estimate via a k=64 KMV sketch, with
    the exact count alongside to expose the estimation error."""
    events = load(spark, sf_dir, "events")
    d = events.select("event_type", "user_id").distinct()
    h = d.select("event_type", F.expr(_H_SPARK).alias("h"))
    w = Window.partitionBy("event_type").orderBy("h")
    r = h.withColumn("rn", F.row_number().over(w))
    return r.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_distinct_exact"),
        F.max(F.when(F.col("rn") == _K, F.col("h"))).alias("kth_min_hash"),
        F.when(
            F.count(F.lit(1)) <= _K, F.count(F.lit(1)).cast("double")
        )
        .otherwise((_K - 1) / F.max(F.when(F.col("rn") == _K, F.col("h"))))
        .alias("kmv_estimate"),
    )
