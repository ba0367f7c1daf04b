"""Fixture pipeline: fleet-level aggregate over alerts."""
from pyspark.sql import functions as F


def main(spark):
    alerts = spark.read.parquet("s3a://fleet-lake/gold/alerts/")

    fleet = (
        alerts.groupBy("site", "reading_date")
        .agg(
            F.sum("alert_score").alias("site_alert_score"),
            F.count("device_id").alias("n_readings"),
        )
        .withColumn("score_per_reading", F.col("site_alert_score") / F.col("n_readings"))
    )

    fleet.write.mode("overwrite").parquet("s3a://fleet-lake/gold/fleet_rollup/")
