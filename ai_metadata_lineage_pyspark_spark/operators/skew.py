"""Skew mitigation: salted two-phase aggregation.

At 100 TB a single heavy-hitter key (one bot user, one null-ish default)
turns a groupBy shuffle into one straggler task. AQE's skew-join splitting
covers joins; for aggregations the standard fix is salting: phase 1 groups
by (key, salt) so a hot key's rows spread over N_SALTS reducers, phase 2
merges the partials by key. Every aggregate here is decomposable:
count/sum/min/max merge trivially; exact distinct-count merges as
collect_set -> flatten -> array_distinct (bounded by the true distinct
count per key, not row count).

The oracle is the unsalted single-phase GROUP BY — proving the two-phase
plan is semantically identical, which is the entire point of the pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.io import load
from ..registry import register

_N_SALTS = 16


@register(
    "skew_salted_user_rollup",
    bench=True,
    oracle="""
    SELECT user_id,
      COUNT(*) AS events,
      MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS first_ts_us,
      MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS last_ts_us,
      COUNT(DISTINCT event_type) AS distinct_types,
      CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS total_value_c
    FROM events
    GROUP BY user_id
    """,
)
def skew_salted_user_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted per-user rollup, value-identical to the plain
    GROUP BY (the oracle): phase 1 spreads each user over 16 salt buckets,
    phase 2 merges partials — no reducer ever sees more than 1/16 of a hot
    user's rows."""
    events = load(spark, sf_dir, "events")
    salted = events.withColumn("salt", (F.col("event_id") % _N_SALTS).cast("int"))
    phase1 = salted.groupBy("user_id", "salt").agg(
        F.count(F.lit(1)).alias("p_events"),
        F.min("ts_us").alias("p_first"),
        F.max("ts_us").alias("p_last"),
        F.collect_set("event_type").alias("p_types"),
        F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias("p_value"),
    )
    return phase1.groupBy("user_id").agg(
        F.sum("p_events").alias("events"),
        F.min("p_first").alias("first_ts_us"),
        F.max("p_last").alias("last_ts_us"),
        F.size(F.array_distinct(F.flatten(F.collect_list("p_types"))))
        .cast("bigint")
        .alias("distinct_types"),
        F.sum("p_value").alias("total_value_c"),
    )
