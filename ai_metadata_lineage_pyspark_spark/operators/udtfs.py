"""Python UDTF surface (Spark 4): a user-defined TABLE function consuming a
TABLE argument with PARTITION BY — the API for per-group custom logic that
returns a *relation*, invoked from SQL like any built-in table function.

Positioning (per the engine's UDF doctrine): row-at-a-time Python is the
SLOW path — the vectorized twin of this exact computation is
`batch_user_stats` (applyInPandas, Arrow-batched), and THAT is the hot-path
shape for 100 TB. The UDTF here exercises the API surface a platform must
still support: SQL-invocable table functions for control-plane/per-group
logic where the per-group row count is small and SQL-composability matters
more than throughput. The driver oracle hash-checks its results like any
relational operator's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf

from ..functions.io import load_events
from ..registry import register


@udtf(
    returnType=(
        "user_id long, n_events long, n_purchases long,"
        " first_ts_us long, last_ts_us long"
    )
)
class _UserStatsUDTF:
    """One instance per PARTITION BY group: fold the group's rows into a
    constant-size summary, emit it from terminate()."""

    def __init__(self) -> None:
        self.user_id = None
        self.n = 0
        self.n_purchases = 0
        self.first_ts = None
        self.last_ts = None

    def eval(self, row) -> None:
        self.user_id = row["user_id"]
        self.n += 1
        if row["event_type"] == "purchase":
            self.n_purchases += 1
        ts = row["ts_us"]
        self.first_ts = ts if self.first_ts is None else min(self.first_ts, ts)
        self.last_ts = ts if self.last_ts is None else max(self.last_ts, ts)

    def terminate(self):
        if self.user_id is not None:
            yield (
                self.user_id,
                self.n,
                self.n_purchases,
                self.first_ts,
                self.last_ts,
            )


@register(
    "user_stats_table_udtf",
    oracle="""
    SELECT user_id,
      CAST(COUNT(*) AS BIGINT) AS n_events,
      CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
        AS n_purchases,
      MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS first_ts_us,
      MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS last_ts_us
    FROM events
    GROUP BY user_id
    """,
)
def user_stats_table_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event summary through a SQL-invocable Python UDTF with a
    TABLE argument: `user_stats_udtf(TABLE(ev) PARTITION BY user_id)` —
    the engine routes each user's rows to one UDTF instance (the
    PARTITION BY shuffle is the same single user-keyed exchange every
    per-user operator here uses), and the function returns a relation
    that composes in SQL. Results hash-match the plain GROUP BY oracle;
    the vectorized hot-path twin is `batch_user_stats`."""
    spark.udtf.register("user_stats_udtf", _UserStatsUDTF)
    load_events(spark, sf_dir).select(
        "user_id", "event_type", "ts_us"
    ).createOrReplaceTempView("udtf_events_in")
    return spark.sql(
        "SELECT user_id, n_events, n_purchases, first_ts_us, last_ts_us"
        " FROM user_stats_udtf(TABLE(udtf_events_in) PARTITION BY user_id)"
    )
