"""Invariants for the behavioral-analytics operators beyond the oracle hash."""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_metadata_lineage_pyspark_spark.functions.io import load
from ai_metadata_lineage_pyspark_spark.operators.behavior import (
    sliding_window_counts,
    user_retention_cohorts,
)


def test_retention_offset_zero_is_full_cohort(spark, sf_dir):
    r = user_retention_cohorts(spark, sf_dir)
    zero = r.filter(F.col("week_offset") == 0)
    # every cohort has an offset-0 row with the whole cohort active
    assert zero.filter(F.col("n_active") != F.col("cohort_size")).count() == 0
    assert zero.filter(F.col("retention_rate") != 1.0).count() == 0
    # activity can never exceed cohort size, offsets are non-negative
    assert r.filter(
        (F.col("n_active") > F.col("cohort_size")) | (F.col("week_offset") < 0)
    ).count() == 0


def test_retention_cohorts_partition_users(spark, sf_dir):
    """Summing cohort sizes over distinct cohorts recovers the user count."""
    r = user_retention_cohorts(spark, sf_dir)
    total = (
        r.select("cohort_week", "cohort_size")
        .distinct()
        .agg(F.sum("cohort_size"))
        .collect()[0][0]
    )
    n_users = load(spark, sf_dir, "events").select("user_id").distinct().count()
    assert total == n_users


def test_sliding_windows_double_count(spark, sf_dir):
    """2h window with a 1h hop: every event lands in exactly 2 windows."""
    s = sliding_window_counts(spark, sf_dir)
    total = s.agg(F.sum("n_events")).collect()[0][0]
    n_events = load(spark, sf_dir, "events").count()
    assert total == 2 * n_events
