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


def _parse_bytes(conf_value: str) -> int:
    """Parse a Spark byte conf ('134217728b', '128MB', '1g', bare int)."""
    s = conf_value.strip().lower()
    units = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}
    s = s.removesuffix("b")
    if s and s[-1] in units:
        return int(s[:-1]) * units[s[-1]]
    return int(s)


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition an under-partitioned input before CPU-heavy
    per-row work (shingling, hashing, signature folds).

    Parquet splitting is byte-based (`spark.sql.files.maxPartitionBytes`), so
    a small file lands in one partition and serializes expensive expressions
    onto one core no matter how many the cluster has. At real scale inputs
    arrive in many splits and this is a no-op, so the shuffle cost is paid
    exactly when it buys parallelism.

    Under-split detection uses the optimizer's size statistics (for a file
    scan: total input bytes, from the already-loaded file index) against
    maxPartitionBytes — Catalyst-side and job-free, unlike the previous
    `df.rdd.getNumPartitions()` probe, which forced a plan-to-RDD conversion
    on every call.
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    max_bytes = _parse_bytes(spark.conf.get("spark.sql.files.maxPartitionBytes", "128m"))
    est_bytes = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    # enough bytes to fill `target` max-size splits -> the scan is already
    # parallel; repartitioning would only add a shuffle
    if est_bytes >= target * max_bytes:
        return df
    return df.repartition(target)
