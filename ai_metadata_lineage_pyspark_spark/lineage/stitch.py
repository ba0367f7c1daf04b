"""Repo-wide stitching: link scripts whose write paths are read elsewhere.

Spark-native re-expression of the reference's stitcher
(extractor/stitch_repo.py:4-29): the dict-based writer index becomes a
broadcast equi-join of the writes side onto the reads side, keyed on the
normalized path (strip + rstrip '/'). The reference's dict-overwrite
last-writer-wins (stitch_repo.py:15-19) is made explicit and deterministic:
max(script_name) per written path.

Scale notes: asset tables are tiny relative to data; the join broadcasts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _norm_path(col: Column) -> Column:
    return F.regexp_replace(F.trim(col), "/+$", "")


def stitch_links(assets: DataFrame) -> DataFrame:
    """assets fact table -> (from_script, to_script, asset) script-DAG edges."""
    writes = (
        assets.filter(F.col("direction") == "write")
        .groupBy(_norm_path(F.col("path")).alias("asset"))
        .agg(F.max("script_name").alias("from_script"))
    )
    reads = assets.filter(F.col("direction") == "read").select(
        _norm_path(F.col("path")).alias("asset"),
        F.col("script_name").alias("to_script"),
    )
    return (
        F.broadcast(writes)
        .join(reads, "asset")
        .filter(F.col("from_script") != F.col("to_script"))
        .select("from_script", "to_script", "asset")
        .distinct()
    )
