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

# orders snapshot cutoff for the CDC diff (fixture dates span 1995..2001)
_CDC_CUTOFF = "2000-01-01"


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


# ---------------------------------------------------------------------------
# time_weighted_avg — TWA of a sampled metric per key: each observation
# holds until the next one, so the mean weights each value by its holding
# duration, not per-sample. The kdb/TimescaleDB `time_weight('locf')`
# semantic, absent from Spark's aggregate set.
#
# Exactness across engines: the metric is fixed-pointed to integer cents and
# durations to whole seconds, so the weighted sum and total duration are
# exact BIGINT aggregates in both engines; the final ratio is ONE double
# division of identical integers — bit-identical, no rounding needed.
#
# Scale: one window (lead) and one aggregate, both partitioned by the same
# high-cardinality user key — a single hash exchange end-to-end, and the
# aggregate's partials combine map-side.
# ---------------------------------------------------------------------------


@register(
    "time_weighted_avg",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id,
        epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        CAST(floor(value * 100) AS BIGINT) AS value_c
      FROM events
    ),
    seg AS (
      SELECT user_id, value_c,
        (lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
          - ts_us) // 1000000 AS dt_s
      FROM e
    )
    SELECT user_id,
      CAST(SUM(dt_s) AS BIGINT) AS held_s,
      CAST(SUM(value_c * dt_s) AS BIGINT) AS weighted_sum_c,
      CAST(CAST(SUM(value_c * dt_s) AS BIGINT) AS DOUBLE)
        / CAST(SUM(dt_s) AS BIGINT) AS twa_value_c
    FROM seg
    WHERE dt_s IS NOT NULL
    GROUP BY user_id
    HAVING SUM(dt_s) > 0
    """,
)
def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average of `value`: each event's value holds
    until the user's next event; the last event holds nothing (no segment).
    Users whose events all land within one second are dropped (no holding
    time to weight by)."""
    e = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts_us",
        F.expr("cast(floor(value * 100) as bigint)").alias("value_c"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    dt_s = F.expr("(next_ts - ts_us) div 1000000")
    seg = (
        e.withColumn("next_ts", F.lead("ts_us").over(w))
        .select("user_id", "value_c", dt_s.alias("dt_s"))
        .filter(F.col("dt_s").isNotNull())
    )
    return (
        seg.groupBy("user_id")
        .agg(
            F.sum("dt_s").alias("held_s"),
            F.sum(F.col("value_c") * F.col("dt_s")).alias("weighted_sum_c"),
        )
        .filter(F.col("held_s") > 0)
        .select(
            "user_id",
            "held_s",
            "weighted_sum_c",
            (F.col("weighted_sum_c").cast("double") / F.col("held_s")).alias("twa_value_c"),
        )
    )


# ---------------------------------------------------------------------------
# timeseries_gapfill — dense daily grid per user with zero-filled counts and
# last-observation-carried-forward values: the TimescaleDB `time_bucket_gapfill
# + locf` / Flink fill operator. Spark has no gap-fill; the rewrite is
# calendar-sized, not data-sized:
#   * the calendar is days-between-bounds — tiny at ANY corpus scale (a year
#     of days is 365 rows even at 100 TB), so it broadcasts and the grid
#     build is a broadcast nested-loop over the distinct-user list, never a
#     shuffle of the fact table;
#   * the fact table is touched exactly twice, both times pre-aggregated to
#     (user, day) — the LOCF window then runs over grid-sized data.
# ---------------------------------------------------------------------------


@register(
    "timeseries_gapfill",
    oracle="""
    WITH e AS (
      SELECT user_id, CAST(ts AS DATE) AS d,
        CAST(floor(value * 100) AS BIGINT) AS value_c
      FROM events
    ),
    daily AS (
      SELECT user_id, d, COUNT(*) AS n,
        CAST(SUM(value_c) AS BIGINT) AS v
      FROM e GROUP BY user_id, d
    ),
    b AS (SELECT min(d) AS lo, max(d) AS hi FROM e),
    cal AS (
      SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
        CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS d
      FROM b
    ),
    u AS (SELECT DISTINCT user_id FROM e)
    SELECT u.user_id, cal.d AS obs_date,
      CAST(COALESCE(daily.n, 0) AS BIGINT) AS n_events,
      last_value(daily.v IGNORE NULLS)
        OVER (PARTITION BY u.user_id ORDER BY cal.d) AS locf_value_c,
      daily.n IS NULL AS is_gap
    FROM u
    CROSS JOIN cal
    LEFT JOIN daily ON daily.user_id = u.user_id AND daily.d = cal.d
    """,
)
def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily per-user event counts on a dense calendar: days with no events
    appear with n_events=0 / is_gap=true, and the day's summed value carries
    forward from the last observed day (NULL before a user's first one)."""
    e = load(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").cast("date").alias("d"),
        F.expr("cast(floor(value * 100) as bigint)").alias("value_c"),
    )
    daily = e.groupBy("user_id", "d").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value_c").alias("v")
    )
    cal = (
        e.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
        .select(F.explode(F.sequence("lo", "hi")).alias("d"))
    )
    users = e.select("user_id").distinct()
    grid = users.join(F.broadcast(cal))
    w = Window.partitionBy("user_id").orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        grid.join(daily, ["user_id", "d"], "left")
        .select(
            "user_id",
            F.col("d").alias("obs_date"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
            F.last("v", ignorenulls=True).over(w).alias("locf_value_c"),
            F.col("n").isNull().alias("is_gap"),
        )
    )


# ---------------------------------------------------------------------------
# snapshot_diff_cdc — change-data-capture reconciliation: given two
# snapshots of a keyed table, classify every key as inserted / deleted /
# updated / unchanged and roll up per class. This is the batch-CDC diff that
# feeds incremental pipelines when the source has no changelog.
#
# The fixture derives both snapshots from `orders` with a date cutoff: the
# "old" snapshot is pre-cutoff rows as stored; the "new" snapshot drops
# low-value finished orders (deletes), bumps urgent pre-cutoff prices
# (updates), and includes post-cutoff rows (inserts). Prices compare as
# integer cents, so equality is exact.
#
# Scale: both snapshots project to (key, price) before a single full-outer
# sort-merge join on the key — the canonical shape; at 100 TB the snapshots
# are separate tables bucketed on the key and the join is co-located.
# ---------------------------------------------------------------------------


@register(
    "snapshot_diff_cdc",
    oracle=f"""
    WITH src AS (
      SELECT o_orderkey AS k,
        CAST(floor(o_totalprice * 100) AS BIGINT) AS price_c,
        o_orderstatus AS st, o_orderpriority AS pri,
        o_orderdate < TIMESTAMP '{_CDC_CUTOFF} 00:00:00' AS pre
      FROM orders
    ),
    old AS (SELECT k, price_c FROM src WHERE pre),
    new AS (
      SELECT k,
        CASE WHEN pre AND pri = '1-URGENT' THEN price_c + 500
             ELSE price_c END AS price_c
      FROM src
      WHERE NOT (pre AND st = 'F' AND price_c < 2000000)
    )
    SELECT
      CASE WHEN new.k IS NULL THEN 'deleted'
           WHEN old.k IS NULL THEN 'inserted'
           WHEN new.price_c <> old.price_c THEN 'updated'
           ELSE 'unchanged' END AS change_type,
      COUNT(*) AS n_orders,
      CAST(SUM(COALESCE(new.price_c, old.price_c)) AS BIGINT) AS total_price_c,
      MIN(COALESCE(new.k, old.k)) AS min_orderkey,
      MAX(COALESCE(new.k, old.k)) AS max_orderkey
    FROM old FULL OUTER JOIN new ON old.k = new.k
    GROUP BY 1
    """,
)
def snapshot_diff_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff: full-outer join old vs new on the order key, classify
    each key's change type, and roll up counts + value per class."""
    src = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.expr("cast(floor(o_totalprice * 100) as bigint)").alias("price_c"),
        F.col("o_orderstatus").alias("st"),
        F.col("o_orderpriority").alias("pri"),
        (F.col("o_orderdate") < F.lit(_CDC_CUTOFF).cast("timestamp")).alias("pre"),
    )
    old = src.filter("pre").select("k", "price_c")
    new = (
        src.filter(~(F.col("pre") & (F.col("st") == "F") & (F.col("price_c") < 2000000)))
        .select(
            "k",
            F.when(F.col("pre") & (F.col("pri") == "1-URGENT"), F.col("price_c") + 500)
            .otherwise(F.col("price_c"))
            .alias("price_c"),
        )
    )
    o, n = old.alias("o"), new.alias("n")
    joined = o.join(n, F.col("o.k") == F.col("n.k"), "full_outer")
    change = (
        F.when(F.col("n.k").isNull(), "deleted")
        .when(F.col("o.k").isNull(), "inserted")
        .when(F.col("n.price_c") != F.col("o.price_c"), "updated")
        .otherwise("unchanged")
    )
    return (
        joined.select(
            change.alias("change_type"),
            F.coalesce(F.col("n.k"), F.col("o.k")).alias("k"),
            F.coalesce(F.col("n.price_c"), F.col("o.price_c")).alias("price_c"),
        )
        .groupBy("change_type")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("price_c").alias("total_price_c"),
            F.min("k").alias("min_orderkey"),
            F.max("k").alias("max_orderkey"),
        )
    )
