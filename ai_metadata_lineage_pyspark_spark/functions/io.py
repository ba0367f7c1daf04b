"""Shared load helpers that normalize fixture quirks.

The `events` parquet stores TIMESTAMP(NANOS) which Spark's vectorized parquet
reader rejects; we read it as raw nanos (`spark.sql.legacy.parquet.nanosAsLong`)
and derive both a micros-long and a TIMESTAMP_NTZ column. Everything is pinned
to UTC semantics so results are independent of the host/session timezone and
line up with the DuckDB oracle's naive timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def ensure_engine_confs(spark: SparkSession) -> None:
    """Runtime-settable confs every query needs (safe to call repeatedly)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with `ts` as TIMESTAMP_NTZ and `ts_us` as epoch-microseconds.

    `ts_us = ts_nanos div 1000` matches DuckDB's `epoch_us(CAST(ts AS TIMESTAMP))`
    (both floor to microseconds), so gap/session arithmetic can be done on exact
    integers in both engines.
    """
    ensure_engine_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        df.withColumn("ts_us", F.expr("ts div 1000"))
        .withColumn("ts", F.timestamp_micros(F.col("ts_us")).cast("timestamp_ntz"))
    )


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    ensure_engine_confs(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition an under-partitioned input before CPU-heavy
    per-row work (shingling, hashing, signature folds).

    Parquet splitting is byte-based (`spark.sql.files.maxPartitionBytes`), so
    a small file lands in one partition and serializes expensive expressions
    onto one core no matter how many the cluster has. At real scale inputs
    arrive in many splits and this is a no-op (we only repartition when the
    scan yields fewer partitions than the target), so the shuffle cost is
    paid exactly when it buys parallelism.
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
