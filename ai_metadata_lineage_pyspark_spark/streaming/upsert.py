"""foreachBatch streaming upsert: the micro-batch merge-sink pattern.

The one Structured Streaming sink class the session/joins modules don't
cover: `foreachBatch`, the escape hatch for sinks with no native streaming
writer (JDBC upserts, Delta MERGE before it had a streaming API, any
idempotent key-merge target). Each micro-batch is handed to a normal batch
function that MERGES it into the accumulated target state.

Merge discipline (what makes this correct under retries and at scale):

* per-batch reduction FIRST — the batch collapses to one row per key
  before touching the target, so merge cost is O(|keys in batch|);
* the target state is itself a keyed reduction of decomposable partials
  (max_by over a total-order key + count sums), so
  merge(target, batch) == reduce(all events seen) regardless of batch
  boundaries — replaying a batch is detectable/idempotent at the Delta
  layer, and batch-split choices (file-source may deliver 1..n batches)
  cannot change the result;
* at 100 TB the in-session holder becomes a Delta table and the union +
  re-reduce becomes MERGE INTO (operators/merge.py); the plan shape per
  batch is identical.

Determinism: the fixture directory yields a bounded availableNow run; the
final state equals the batch latest-per-user reduction, which is what the
DuckDB oracle expresses (order-insensitive — the merge operators commute).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..session import iter_checkpoint
from .sessions import read_events_stream

# total-order tiebreak key (windows.py _MAXBY_ORD convention): fixed-width
# zero-padded (ts_us, event_id) concat — composite ordering for max_by in
# both engines
_ORD = (
    "concat(lpad(cast(ts_us as string), 20, '0'),"
    " lpad(cast(event_id as string), 20, '0'))"
)


def _reduce_latest(df: DataFrame) -> DataFrame:
    """Collapse events (or partial states) to one row per user. Idempotent
    and associative: reduce(reduce(a) U reduce(b)) == reduce(a U b)."""
    return df.selectExpr(
        "user_id",
        "event_id",
        "event_type",
        "ts_us",
        "n_events",
        f"{_ORD} AS ord",
    ).groupBy("user_id").agg(
        F.expr("max_by(event_id, ord)").alias("event_id"),
        F.expr("max_by(event_type, ord)").alias("event_type"),
        F.max("ts_us").alias("ts_us"),
        F.sum("n_events").alias("n_events"),
    )


@register(
    "streaming_foreach_upsert",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, event_type,
        epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        concat(lpad(CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS VARCHAR), 20, '0'),
               lpad(CAST(event_id AS VARCHAR), 20, '0')) AS ord
      FROM events
    )
    SELECT user_id,
      max_by(event_id, ord) AS latest_event_id,
      max_by(event_type, ord) AS latest_event_type,
      MAX(ts_us) AS latest_ts_us,
      COUNT(*) AS n_events
    FROM e
    GROUP BY user_id
    """,
)
def streaming_foreach_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming latest-per-user upsert via foreachBatch: every micro-batch
    is reduced to per-key partials and merged into the running target by
    union + re-reduction (the commutative-merge form of MERGE INTO)."""
    events = read_events_stream(spark, sf_dir).select(
        "user_id", "event_id", "event_type", "ts_us", F.lit(1).alias("n_events")
    )
    state: dict[str, DataFrame | None] = {"target": None}

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        batch_state = _reduce_latest(batch_df)
        if state["target"] is None:
            merged = batch_state
        else:
            merged = _reduce_latest(state["target"].unionByName(batch_state))
        # materialize: the next batch's merge must not re-execute this
        # batch's (already-consumed) streaming source plan
        state["target"] = iter_checkpoint(merged)

    q = (
        events.writeStream.foreachBatch(upsert)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    target = state["target"]
    assert target is not None, "stream produced no micro-batches"
    return target.select(
        "user_id",
        F.col("event_id").alias("latest_event_id"),
        F.col("event_type").alias("latest_event_type"),
        F.col("ts_us").alias("latest_ts_us"),
        "n_events",
    )


# ---------------------------------------------------------------------------
# streaming_kmv_sketch — mergeable-sketch maintenance across micro-batches:
# the streaming twin of operators/sketch.py::kmv_distinct_sketch. State per
# event_type is the k smallest DISTINCT md5 hashes seen so far; each batch
# merges by union + re-truncate (associative + commutative + idempotent, so
# batch-split choices and replays cannot change the result — the same
# merge discipline as streaming_foreach_upsert, applied to sketch state
# instead of latest-row state).
# ---------------------------------------------------------------------------

_SKW_K = 64


def _reduce_kmv(df: DataFrame) -> DataFrame:
    """Truncate (event_type, h) rows to the k smallest distinct hashes per
    type. reduce(reduce(a) U reduce(b)) == reduce(a U b)."""
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("h")
    return (
        df.distinct()
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= _SKW_K)
        .drop("__rn")
    )


@register(
    "streaming_kmv_sketch",
    oracle=f"""
    WITH d AS (
      SELECT DISTINCT event_type,
        CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
             AS DOUBLE) / 4294967296.0 AS h
      FROM events
    ),
    r AS (
      SELECT event_type, h,
        ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM d
    )
    SELECT event_type,
      CAST(COUNT(*) AS BIGINT) AS n_in_sketch,
      MAX(CASE WHEN rn = {_SKW_K} THEN h END) AS kth_min_hash,
      CASE WHEN COUNT(*) < {_SKW_K} THEN CAST(COUNT(*) AS DOUBLE)
           ELSE ({_SKW_K} - 1) / MAX(CASE WHEN rn = {_SKW_K} THEN h END)
      END AS kmv_estimate
    FROM r WHERE rn <= {_SKW_K}
    GROUP BY event_type
    """,
)
def streaming_kmv_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct-user KMV estimate maintained incrementally
    over the event stream: every micro-batch hashes its (type, user)
    pairs and merges into O(k)-per-type sketch state by union + keep-k-
    smallest-distinct. Because the merge is a bounded idempotent
    semilattice join, the final sketch equals the batch sketch over the
    same events regardless of how the file source split the batches — and
    the DuckDB oracle asserts exactly that equality, estimate included.

    This is the shape a 100 TB ingest pipeline uses for continuous
    cardinality monitoring: state is k hashes per group (not a distinct
    set), each batch touches only its own keys, and sketches from
    different shards/streams union losslessly. (KMV here operates on the
    distinct HASH set — the textbook definition — so an 8-hex-digit
    collision of two user_ids is absorbed identically in both engines.)"""
    events = read_events_stream(spark, sf_dir)
    h = events.selectExpr(
        "event_type",
        "cast(conv(substr(md5(cast(user_id as string)), 1, 8), 16, 10) as double)"
        " / 4294967296.0 AS h",
    )
    state: dict[str, DataFrame | None] = {"sketch": None}

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        batch_sketch = _reduce_kmv(batch_df)
        if state["sketch"] is None:
            merged = batch_sketch
        else:
            merged = _reduce_kmv(state["sketch"].unionByName(batch_sketch))
        state["sketch"] = iter_checkpoint(merged)

    q = h.writeStream.foreachBatch(merge).trigger(availableNow=True).start()
    q.awaitTermination()
    sketch = state["sketch"]
    assert sketch is not None, "stream produced no micro-batches"
    return sketch.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_in_sketch"),
        F.when(F.count(F.lit(1)) == _SKW_K, F.max("h")).alias("kth_min_hash"),
        F.when(
            F.count(F.lit(1)) < _SKW_K, F.count(F.lit(1)).cast("double")
        )
        .otherwise((_SKW_K - 1) / F.max("h"))
        .alias("kmv_estimate"),
    )
