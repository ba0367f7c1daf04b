"""Fixture pipeline: latest device registry record per device (SCD dedup)."""
from pyspark.sql import Window
from pyspark.sql import functions as F


def main(spark):
    registry = spark.read.parquet("s3a://fleet-lake/raw/device_registry/")

    w = Window.partitionBy("device_id").orderBy(F.col("updated_at").desc())
    device_dim = (
        registry
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .withColumn(
            "support_tier",
            F.when(F.col("contract_value") >= 50000, "premium")
            .when(F.col("contract_value") >= 10000, "standard")
            .otherwise("basic"),
        )
        .withColumn("site_code", F.regexp_extract(F.col("site_uri"), r"site://(\w+)", 1))
    )

    device_dim.write.mode("overwrite").parquet("s3a://fleet-lake/silver/device_dim/")
