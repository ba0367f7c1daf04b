"""SCD-1 upsert (MERGE) semantics expressed as a batch full-outer join.

Reference semantics: script_08_delta_merge_scd1_customer.py:16-36 (DataFrame
merge API: whenMatchedUpdate / whenNotMatchedInsert) and
script_09_sql_merge_inventory.py:15-26 (SQL MERGE with a conditional
`WHEN MATCHED AND s.updated_at >= t.updated_at` update clause).

Delta Lake is an optional dependency that is absent in this environment, so
the engine expresses the same row-level semantics relationally: a full outer
join of target and deduplicated source, with CASE logic selecting the
surviving column values. On a cluster with Delta available,
`merge_scd1_delta` (below) shows the same operation against a Delta table —
it is import-gated and not part of the oracle surface.

Scale notes: the dedup-latest uses a (key ORDER BY ts DESC) row_number — one
shuffle; the merge join is a shuffle hash join on the merge key. With the
target stored bucketed by the merge key, the join is co-located and
shuffle-free on the target side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.io import load
from ..registry import register


def latest_customer_updates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The merge source: latest per-user event as (user_id, new_acctbal,
    updated_at). Shared by the relational merge and the Delta-parity test so
    both paths replay identical update rows."""
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.round(F.col("value") * 100, 2).alias("new_acctbal"),
            F.col("ts").alias("updated_at"),
        )
    )


@register(
    "scd1_merge_customer",
    oracle="""
    WITH latest AS (
      SELECT user_id, new_acctbal, updated_at FROM (
        SELECT
          user_id,
          ROUND(value * 100, 2) AS new_acctbal,
          CAST(ts AS TIMESTAMP) AS updated_at,
          ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
      ) WHERE rn = 1
    )
    SELECT
      COALESCE(c.c_custkey, s.user_id) AS custkey,
      CASE
        WHEN c.c_custkey IS NULL THEN 'NEW-CUSTOMER'
        ELSE c.c_name
      END AS name,
      CASE
        WHEN c.c_custkey IS NULL THEN s.new_acctbal
        WHEN s.user_id IS NOT NULL AND s.new_acctbal >= 500 THEN s.new_acctbal
        ELSE c.c_acctbal
      END AS acctbal,
      CASE
        WHEN c.c_custkey IS NULL THEN 'inserted'
        WHEN s.user_id IS NOT NULL AND s.new_acctbal >= 500 THEN 'updated'
        ELSE 'kept'
      END AS merge_action,
      s.updated_at AS updated_at
    FROM customer c
    FULL OUTER JOIN latest s ON c.c_custkey = s.user_id
    """,
)
def scd1_merge_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Target = customer snapshot; source = latest per-user event.

    WHEN MATCHED AND new_acctbal >= 500 THEN UPDATE (conditional clause as in
    script_09:19), WHEN NOT MATCHED THEN INSERT; unmatched target rows kept
    (SCD-1 keeps history-free current state).
    """
    customer = load(spark, sf_dir, "customer").alias("c")
    latest = latest_customer_updates(spark, sf_dir).alias("s")
    joined = customer.join(latest, F.col("c.c_custkey") == F.col("s.user_id"), "full_outer")
    inserted = F.col("c.c_custkey").isNull()
    updated = F.col("s.user_id").isNotNull() & (F.col("s.new_acctbal") >= 500)
    return joined.select(
        F.coalesce(F.col("c.c_custkey"), F.col("s.user_id")).alias("custkey"),
        F.when(inserted, F.lit("NEW-CUSTOMER")).otherwise(F.col("c.c_name")).alias("name"),
        F.when(inserted, F.col("s.new_acctbal"))
        .when(updated, F.col("s.new_acctbal"))
        .otherwise(F.col("c.c_acctbal"))
        .alias("acctbal"),
        F.when(inserted, F.lit("inserted"))
        .when(updated, F.lit("updated"))
        .otherwise(F.lit("kept"))
        .alias("merge_action"),
        F.col("s.updated_at").alias("updated_at"),
    )


def merge_scd1_delta(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key: str,
    match_condition: str | None = None,
    update_set: dict[str, str] | None = None,
    insert_values: dict[str, str] | None = None,
) -> None:
    """Delta-backed variant of the same merge (script_08:16-36 surface, plus
    script_09:19's conditional WHEN MATCHED clause via `match_condition`).

    `update_set` / `insert_values` map target columns to source expressions
    (the whenMatchedUpdate / whenNotMatchedInsert dict API); when omitted the
    *All forms apply, which require aligned schemas. Import-gated: raises
    RuntimeError when delta-spark is not installed.
    """
    try:
        from delta.tables import DeltaTable  # type: ignore
    except ImportError as exc:  # pragma: no cover - delta absent in test env
        raise RuntimeError("delta-spark not available in this environment") from exc

    if not DeltaTable.isDeltaTable(spark, target_path):  # pragma: no cover
        updates.withColumn("ingested_at", F.current_timestamp()).write.format("delta").mode(
            "overwrite"
        ).save(target_path)
        return
    tgt = DeltaTable.forPath(spark, target_path)  # pragma: no cover
    m = tgt.alias("t").merge(updates.alias("s"), f"t.{key} = s.{key}")
    if update_set is not None:  # pragma: no cover - delta absent in test env
        m = m.whenMatchedUpdate(condition=match_condition, set=update_set)
    else:  # pragma: no cover
        m = m.whenMatchedUpdateAll(condition=match_condition)
    if insert_values is not None:  # pragma: no cover
        m = m.whenNotMatchedInsert(values=insert_values)
    else:  # pragma: no cover
        m = m.whenNotMatchedInsertAll()
    m.execute()  # pragma: no cover


# ---------------------------------------------------------------------------
# scd2_user_state_history — slowly-changing-dimension TYPE 2 build (r8):
# the companion to scd1_merge_customer. SCD-1 overwrites; SCD-2 keeps
# HISTORY — one row per state episode with a validity interval and a
# current flag. Built from the events stream treated as a CDC feed: each
# user's event_type sequence collapses to its change points (lag filter),
# and each change point's validity runs until the next one (lead).
#
# 100 TB shape: everything runs in ONE user-keyed shuffle — both window
# passes and nothing else partition by user_id, so Spark reuses a single
# exchange; per-row state is constant (lag/lead of one column). Ordering
# is (ts_us, event_id) — a total order, so ties cannot flip episodes
# between engines.
# ---------------------------------------------------------------------------


_SCD2_ORACLE = """
    WITH ev AS (
      SELECT user_id, event_type, event_id,
        epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
      FROM events
    ),
    ch AS (
      SELECT user_id, event_type, event_id, ts_us,
        LAG(event_type) OVER (PARTITION BY user_id
                              ORDER BY ts_us, event_id) AS prev_state
      FROM ev
    ),
    ep AS (
      SELECT user_id, event_type AS state, event_id AS first_event_id,
        ts_us AS valid_from_us,
        LEAD(ts_us) OVER (PARTITION BY user_id
                          ORDER BY ts_us, event_id) AS valid_to_us
      FROM ch
      WHERE prev_state IS NULL OR event_type <> prev_state
    )
    SELECT user_id, state, first_event_id, valid_from_us, valid_to_us,
      valid_to_us IS NULL AS is_current
    FROM ep
    """


@register("scd2_user_state_history", oracle=_SCD2_ORACLE)
def scd2_user_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 state history per user from the event stream (module note
    above): change points via lag over (ts_us, event_id), validity
    intervals via lead over the SAME window key, open interval (NULL
    valid_to_us) marks the current episode. One user-keyed exchange
    serves both window passes."""
    from pyspark.sql.window import Window  # noqa: PLC0415

    from ..functions.io import load_events  # noqa: PLC0415

    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    ev = load_events(spark, sf_dir).select(
        "user_id", "event_type", "event_id", "ts_us"
    )
    ch = ev.withColumn("prev_state", F.lag("event_type").over(w)).filter(
        F.col("prev_state").isNull()
        | (F.col("event_type") != F.col("prev_state"))
    )
    ep = ch.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("event_id").alias("first_event_id"),
        F.col("ts_us").alias("valid_from_us"),
        F.lead("ts_us").over(w).alias("valid_to_us"),
    )
    return ep.select(
        "user_id",
        "state",
        "first_event_id",
        "valid_from_us",
        "valid_to_us",
        F.col("valid_to_us").isNull().alias("is_current"),
    )
