"""Fixture pipeline: enrich bronze readings with device dim + rolling stats."""
from pyspark.sql import Window
from pyspark.sql import functions as F


def main(spark):
    readings = spark.read.parquet("s3a://fleet-lake/bronze/readings/")
    devices = spark.read.parquet("s3a://fleet-lake/silver/device_dim/")

    joined = readings.join(devices, on="device_id", how="left")

    w = Window.partitionBy("device_id").orderBy(F.col("reading_ts").asc())
    enriched = (
        joined
        .withColumn("prev_temp", F.lag("temp_c", 1).over(w))
        .withColumn("temp_delta", F.col("temp_c") - F.coalesce(F.col("prev_temp"), F.lit(0.0)))
        .withColumn("rolling_24_avg", F.avg("temp_c").over(w.rowsBetween(-23, 0)))
    )

    out_path = "s3a://fleet-lake/gold/readings_enriched/"
    enriched.write.mode("overwrite").partitionBy("reading_date").parquet(out_path)
