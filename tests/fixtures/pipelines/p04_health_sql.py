"""Fixture pipeline: per-device health rollup via SQL CTEs."""


def main(spark):
    enriched = spark.read.parquet("s3a://fleet-lake/gold/readings_enriched/")
    enriched.createOrReplaceTempView("readings_enriched")

    health_sql = """
    WITH per_day AS (
      SELECT device_id, reading_date,
             AVG(temp_c) AS day_avg_temp,
             SUM(is_anomaly) AS day_anomalies
      FROM readings_enriched
      GROUP BY device_id, reading_date
    ),
    per_device AS (
      SELECT device_id,
             AVG(day_avg_temp) AS avg_temp,
             SUM(day_anomalies) AS total_anomalies,
             CASE WHEN SUM(day_anomalies) > 10 THEN 'degraded' ELSE 'healthy' END AS health_state
      FROM per_day
      GROUP BY device_id
    )
    SELECT * FROM per_device
    """

    health = spark.sql(health_sql)
    health.write.mode("overwrite").parquet("s3a://fleet-lake/gold/device_health/")
