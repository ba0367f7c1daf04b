"""SparkSession factory tuned for the target workload.

Local tests run on local[N]; the configs are chosen so the same plans scale
to a multi-executor cluster: AQE on (runtime coalesce + skew-join), broadcast
threshold generous enough to broadcast every dimension table, Arrow enabled
for the Pandas-UDF paths, session timezone pinned to UTC so date/timestamp
semantics are stable and match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "ai-metadata-lineage-pyspark-spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # 8g measured faster than 16g on local[32] at sf0.1 (larger heap
        # roughly doubled wall-clock on the multi-stage dedup query — GC
        # geometry, not capacity, is what matters at this scale); override
        # with SPARK_GRAFT_DRIVER_MEM for bigger-SF runs
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
