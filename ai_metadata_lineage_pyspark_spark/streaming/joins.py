"""Stream-stream join and streaming dedup — the two stateful streaming
operator classes sessions.py doesn't cover.

* stream-stream interval join: clicks joined to same-user purchases that
  happen within 30 minutes AFTER the click. Both sides carry watermarks and
  the join condition bounds event time on both ends, so Spark can size and
  evict the join state — the canonical attribution join
  (click -> conversion) that at scale runs continuously with state bounded
  by (watermark delay x input rate), never a full-history buffer.
* dropDuplicatesWithinWatermark: at-least-once sources deliver duplicates;
  this dedups on a business key with state bounded by the watermark horizon
  (exactly-once effect downstream without a full-history key set).

Determinism follows sessions.py's discipline: availableNow over the
single-file fixture -> one micro-batch -> no cross-batch watermark races,
so results equal the batch semantics the DuckDB oracles express. The dedup
query emits ONLY the dedup key columns, so whichever physical row wins the
first-seen race, the output set is the distinct key set.

Batch shadows (`batch_*`) run the same semantics side-effect-free for
harnesses that decline writeStream queries, mirroring sessions.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .sessions import read_events_stream, run_to_memory

_ATTR_WINDOW_MIN = 30

_CLICK_PURCHASE_ORACLE = f"""
    WITH e AS (
      SELECT event_id, user_id, event_type,
        epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
      FROM events
    )
    SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
      p.ts_us - c.ts_us AS delay_us
    FROM e c JOIN e p ON c.user_id = p.user_id
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
      AND p.ts_us >= c.ts_us
      AND p.ts_us <= c.ts_us + {_ATTR_WINDOW_MIN} * 60 * 1000000
"""


def _click_purchase_sides(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("ts_us").alias("click_us"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("ts_us").alias("purchase_us"),
    )
    return clicks, purchases


_JOIN_COND = (
    "c_user = p_user AND purchase_ts >= click_ts "
    f"AND purchase_ts <= click_ts + interval {_ATTR_WINDOW_MIN} minutes"
)


def _attr_select(joined: DataFrame) -> DataFrame:
    return joined.select(
        "click_id",
        "purchase_id",
        F.col("c_user").alias("user_id"),
        (F.col("purchase_us") - F.col("click_us")).alias("delay_us"),
    )


@register("streaming_click_attribution", oracle=_CLICK_PURCHASE_ORACLE)
def streaming_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: each click joined to the same user's
    purchases within the following 30 minutes. Watermarks on BOTH sides plus
    the two-sided time bound let Spark evict join state; append mode emits
    each matched pair exactly once."""
    events = read_events_stream(spark, sf_dir)
    clicks, purchases = _click_purchase_sides(events)
    joined = clicks.withWatermark("click_ts", f"{_ATTR_WINDOW_MIN} minutes").join(
        purchases.withWatermark("purchase_ts", f"{_ATTR_WINDOW_MIN} minutes"),
        F.expr(_JOIN_COND),
        "inner",
    )
    return run_to_memory(_attr_select(joined), "append")


@register("batch_click_attribution", oracle=_CLICK_PURCHASE_ORACLE)
def batch_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same attribution join in batch: user_id equi-key + time-range
    residual compiles to ONE sort-merge join on user_id (never a nested
    loop — the equi key carries the shuffle, the interval is a cheap
    post-filter). Side-effect-free shadow of streaming_click_attribution."""
    from ..functions.io import load_events

    events = load_events(spark, sf_dir).withColumn(
        "ts", F.timestamp_micros(F.col("ts_us"))
    )
    clicks, purchases = _click_purchase_sides(events)
    return _attr_select(clicks.join(purchases, F.expr(_JOIN_COND), "inner"))


_DEDUP_ORACLE = """
    SELECT DISTINCT user_id, event_type,
      epoch_us(CAST(ts AS TIMESTAMP)) // 60000000 AS minute_bucket
    FROM events
"""


@register("streaming_dedup_events", oracle=_DEDUP_ORACLE)
def streaming_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark on (user, type, minute): keeps the
    first arrival per key, with key state evicted once the watermark passes
    the key's minute — bounded-state streaming dedup. Output projects the
    key columns only, so the result is the distinct key set regardless of
    which duplicate row arrived first."""
    events = read_events_stream(spark, sf_dir)
    keyed = events.select(
        "user_id",
        "event_type",
        F.expr("ts_us div 60000000").alias("minute_bucket"),
        "ts",
    )
    deduped = keyed.withWatermark("ts", "30 minutes").dropDuplicatesWithinWatermark(
        ["user_id", "event_type", "minute_bucket"]
    )
    return run_to_memory(deduped, "append").select(
        "user_id", "event_type", "minute_bucket"
    )


@register("batch_event_dedup_keys", oracle=_DEDUP_ORACLE)
def batch_event_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch shadow of streaming_dedup_events: the same key projection with
    a plain distinct (hash aggregate with map-side partials)."""
    from ..functions.io import load_events

    return (
        load_events(spark, sf_dir)
        .selectExpr("user_id", "event_type", "ts_us div 60000000 AS minute_bucket")
        .distinct()
    )
