"""Driver contract for the spark-graft builder (PySpark target).

Thin views over ai_metadata_lineage_pyspark_spark.registry: every registered
operator exposes a (spark, sf_dir) callable and, where SQL-expressible, an
equivalent DuckDB oracle SQL string. See SURVEY.md §2 for the inventory.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ai_metadata_lineage_pyspark_spark.registry import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (script_10-style customer value mart) on sf0.001."""
    q = all_queries()["mart_customer_value"]
    return q.fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible query."""
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
