"""Fixture pipeline: bronze ingest of raw sensor readings (CSV -> parquet)."""
from pyspark.sql import functions as F


def main(spark):
    raw_path = "s3a://fleet-lake/raw/readings/"
    readings = (
        spark.read.option("header", "true").option("inferSchema", "true").csv(raw_path)
    )

    bronze = (
        readings
        .withColumn("reading_ts", F.to_timestamp("reading_ts"))
        .withColumn("reading_date", F.to_date("reading_ts"))
        .withColumn("device_id", F.col("device_id").cast("string"))
        .withColumn("temp_c", F.coalesce(F.col("temp_c").cast("double"), F.lit(0.0)))
        .withColumn("site", F.upper(F.coalesce(F.col("site"), F.lit("UNKNOWN"))))
        .withColumn("is_anomaly", F.when(F.abs(F.col("temp_c")) > 80, F.lit(1)).otherwise(F.lit(0)))
    )

    bronze_path = "s3a://fleet-lake/bronze/readings/"
    bronze.write.mode("overwrite").partitionBy("reading_date").parquet(bronze_path)
