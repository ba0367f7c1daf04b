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
        state["target"] = merged.localCheckpoint(eager=True)

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
