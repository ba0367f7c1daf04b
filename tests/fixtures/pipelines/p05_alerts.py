"""Fixture pipeline: alert scoring joining health rollup to enriched stream."""
from pyspark.sql import functions as F


def main(spark):
    health = spark.read.parquet("s3a://fleet-lake/gold/device_health/")
    enriched = spark.read.parquet("s3a://fleet-lake/gold/readings_enriched/")

    alerts = (
        enriched.join(health, "device_id", "inner")
        .withColumn(
            "alert_score",
            F.when(F.col("health_state") == "degraded", 3).otherwise(0)
            + F.when(F.col("temp_delta") > 20, 2).otherwise(0)
            + F.when(F.col("support_tier").isin("premium", "standard"), 1).otherwise(0),
        )
        .withColumn("alert_flag", F.when(F.col("alert_score") >= 4, F.lit(True)).otherwise(F.lit(False)))
    )

    alerts.write.mode("overwrite").parquet("s3a://fleet-lake/gold/alerts/")
