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


# ---------------------------------------------------------------------------
# Grouped-aggregate pandas UDF (r7): the third and last custom-aggregation
# API shape — mapInPandas (stream), applyInPandas (group -> relation) and
# the SQL UDTF are covered elsewhere; this is the Arrow-vectorized UDAF
# path (`@pandas_udf` + GroupedData.agg), where the UDF sees each group's
# column as ONE pandas Series and returns a scalar, composable with
# built-in aggregates in the same agg() call.
# ---------------------------------------------------------------------------


def _cents_udaf():
    """Built lazily so module import never constructs a pandas UDF. The
    GROUPED_AGG eval type is passed explicitly because this module uses
    `from __future__ import annotations` (signature inference would see
    string annotations)."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf  # noqa: PLC0415

    def sum_floor_cents(v):
        # integer fold => partition/arrival order cannot change the result
        # (a float mean here would hash-diverge run to run); floor before
        # summing matches the oracle's per-row CAST(floor(value*100)).
        # NULLs are dropped BEFORE the cast: np.floor(NaN).astype(int64)
        # is undefined garbage, while SQL SUM skips NULLs — and an
        # all-NULL group returns None (SQL SUM of no rows is NULL, not 0).
        import numpy as np  # noqa: PLC0415

        v = v.dropna()
        if len(v) == 0:
            return None
        return int(np.floor(v.to_numpy() * 100.0).astype("int64").sum())

    def count_rows(v) -> int:
        # COUNT(*) semantics: NULL value rows still count.
        return int(len(v))

    return (
        pandas_udf(sum_floor_cents, "long", PandasUDFType.GROUPED_AGG),
        pandas_udf(count_rows, "long", PandasUDFType.GROUPED_AGG),
    )


@register(
    "grouped_agg_pandas_udf",
    oracle="""
    SELECT event_type,
      CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents_total,
      CAST(COUNT(*) AS BIGINT) AS n_events,
      CAST(SUM(CAST(floor(value * 100) AS BIGINT)) // COUNT(*) AS BIGINT)
        AS cents_per_event
    FROM events
    GROUP BY event_type
    """,
)
def grouped_agg_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized grouped-aggregate pandas UDF: exact-cents revenue
    per event type where the cents fold runs as a `pandas_udf(...,
    GROUPED_AGG)` UDAF over each group's value Series — the API a
    platform exposes for custom aggregation logic that numpy expresses
    better than SQL. Spark refuses to mix grouped-agg pandas UDFs with
    built-in aggregates in one agg() (INVALID_PANDAS_UDF_PLACEMENT,
    learned here the hard way), so the row count is a second UDAF in the
    same Arrow pass rather than a built-in COUNT.

    Scale shape — salted two-level fold: a GROUPED_AGG pandas UDAF has
    no map-side partial aggregation, so a naive groupBy(event_type)
    ships each group's ENTIRE value vector to one Python worker —
    with ~5 event types, parallelism collapses to 5 tasks each
    streaming ~1/5 of the table. Instead the UDAF folds over the
    salted key `(event_type, pmod(hash(event_id), 64))` — parallelism
    is salt-bounded (5×64 tasks), each Arrow batch is ~1/320 of the
    table — and a built-in SUM re-reduces the integer partials to
    `event_type`. The fold is exact int64 cents, so the two-level
    composition is bit-identical to the single-level fold (integer
    addition is associative); the oracle hash is unchanged by
    construction. The per-group derived ratio reuses the re-reduced
    columns, showing they compose like any aggregate output."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    events = load_events(spark, sf_dir)
    cents, nrows = _cents_udaf()
    partial = (
        events.withColumn(
            "salt", F.pmod(F.hash(F.col("event_id")), F.lit(64))
        )
        .groupBy("event_type", "salt")
        .agg(
            cents(F.col("value")).alias("c"),
            nrows(F.col("value")).alias("n"),
        )
    )
    out = partial.groupBy("event_type").agg(
        F.sum("c").cast("long").alias("cents_total"),
        F.sum("n").cast("long").alias("n_events"),
    )
    return out.select(
        "event_type",
        "cents_total",
        "n_events",
        F.expr("cents_total DIV n_events").alias("cents_per_event"),
    )
