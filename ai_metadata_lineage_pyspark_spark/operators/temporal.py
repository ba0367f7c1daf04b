"""Temporal join operators Spark has no built-in form for: as-of join and
range (interval) join, expressed in shuffle-bounded shapes.

Spark's join operator set has no ASOF JOIN (DuckDB/Pandas have one) and a
raw inequality-only join falls back to BroadcastNestedLoopJoin/Cartesian —
a scale-killer. Both operators here use the standard large-scale rewrites:

* as-of: order both sides on one keyed, time-sorted stream and take the
  last prior build-side value with a conditional `last(..., ignorenulls)`
  window — ONE shuffle on the key, no join at all. (For two distinct
  tables, tag-union the streams first: same plan shape; here the probe and
  build rows already live in one table.)
* range: quantize time into fixed buckets, explode the probe side into its
  neighboring buckets, equi-join on the bucket id, then apply the exact
  range predicate bucket-locally. The join stays a hash/sort-merge
  equi-join whose fan-out is bounded by bucket occupancy — never all-pairs.

Oracles use DuckDB's native ASOF JOIN and a plain inequality join
respectively, so the rewrites are checked against the declarative
definition, not against themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.io import load
from ..registry import register

_RANGE_US = 600_000_000  # +/- 10 minutes


@register(
    "asof_join_purchases",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, event_type, value,
        epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
      FROM events
    ),
    p AS (
      -- one build row per (user, instant): max_by(event_id) mirrors the
      -- Spark window's (ts_us, event_id) order tie-break deterministically
      SELECT user_id, ts_us, max_by(value, event_id) AS pv
      FROM e WHERE event_type = 'purchase'
      GROUP BY user_id, ts_us
    )
    SELECT e.event_id, e.user_id, e.event_type,
      p.pv AS last_purchase_value,
      e.ts_us - p.ts_us AS us_since_purchase
    FROM e ASOF LEFT JOIN p
      ON e.user_id = p.user_id AND e.ts_us > p.ts_us
    """,
)
def asof_join_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: attach each event's most recent strictly-prior purchase
    (value + elapsed time) for its user. Implemented as one window over the
    user-keyed time-sorted stream — one shuffle, no join operator."""
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_p = F.col("event_type") == "purchase"
    pv = F.last(F.when(is_p, F.col("value")), ignorenulls=True).over(w)
    pt = F.last(F.when(is_p, F.col("ts_us")), ignorenulls=True).over(w)
    return e.select(
        "event_id",
        "user_id",
        "event_type",
        pv.alias("last_purchase_value"),
        (F.col("ts_us") - pt).alias("us_since_purchase"),
    )


@register(
    "range_join_concurrency",
    oracle=f"""
    WITH e AS (
      SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events
    )
    SELECT a.event_id, COUNT(b.event_id) AS n_concurrent
    FROM e a LEFT JOIN e b
      ON b.ts_us BETWEEN a.ts_us - {_RANGE_US} AND a.ts_us + {_RANGE_US}
     AND b.event_id <> a.event_id
    GROUP BY a.event_id
    """,
)
def range_join_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-temporal range self-join (no equi key at all): count events
    within +/-10 minutes of each event, across all users.

    Bucket rewrite: quantize ts to 10-minute cells, explode each probe row
    into its cell and both neighbors, equi-join on the cell id (build side
    stays on its home cell, so every qualifying pair matches exactly once),
    and apply the exact |dt| predicate bucket-locally. The probe's own home
    cell always contains itself, so an inner join preserves every event for
    the count-including-zeros rollup."""
    e = load(spark, sf_dir, "events").select(
        "event_id", "ts_us", F.expr(f"ts_us div {_RANGE_US}").alias("cell")
    )
    probe = e.select(
        "event_id",
        "ts_us",
        F.explode(
            F.array(F.col("cell") - 1, F.col("cell"), F.col("cell") + 1)
        ).alias("cell"),
    )
    build = e.select(
        F.col("event_id").alias("other_id"),
        F.col("ts_us").alias("other_ts"),
        "cell",
    )
    hit = (
        (F.col("other_id") != F.col("event_id"))
        & (F.abs(F.col("other_ts") - F.col("ts_us")) <= _RANGE_US)
    )
    return (
        probe.join(build, "cell")
        .groupBy("event_id")
        .agg(F.count(F.when(hit, 1)).alias("n_concurrent"))
    )
