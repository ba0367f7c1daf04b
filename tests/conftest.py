"""Shared fixtures: one small local SparkSession for the whole test run.

Tests run on local[4] with 4 shuffle partitions — small enough to be quick,
parallel enough to catch partitioning-dependent bugs (a result that changes
between 1 and 4 partitions is non-deterministic at 1000 executors too).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    from ai_metadata_lineage_pyspark_spark.session import get_spark

    spark = get_spark("pytest", shuffle_partitions=4)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
