"""Script-corpus source: read a directory of .py pipeline scripts as a
DataFrame of (script_name, source).

Spark-native version of the reference's `_iter_scripts` / per-file loop
(static_extract.py:77-89): `spark.read.text(..., wholetext=True)` gives one
row per file with the whole body, partitioned across executors; the UTF-8
"best effort" fallback (static_extract.py:67-74) is what the text source
does natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_scripts_dir(spark: SparkSession, scripts_dir: str) -> DataFrame:
    df = (
        spark.read.option("pathGlobFilter", "*.py")
        .text(scripts_dir, wholetext=True)
        .withColumn("path", F.input_file_name())
    )
    return df.select(
        F.regexp_extract(F.col("path"), r"([^/]+)\.py$", 1).alias("script_name"),
        F.col("value").alias("source"),
    )
