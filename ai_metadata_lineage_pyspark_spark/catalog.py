"""Typed loaders for the fixture tables.

All engine operators take DataFrames (or a `Tables` bundle); nothing below
hardcodes a scale factor. Reads are plain parquet scans so Catalyst gets
predicate pushdown + column pruning for free.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


@dataclass
class Tables:
    """Lazy bundle of the ten fixture tables."""

    spark: SparkSession
    sf_dir: str

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLE_NAMES:
            return load_table(self.spark, self.sf_dir, name)
        raise AttributeError(name)

    def register_views(self) -> None:
        for name in TABLE_NAMES:
            load_table(self.spark, self.sf_dir, name).createOrReplaceTempView(name)
