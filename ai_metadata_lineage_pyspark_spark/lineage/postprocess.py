"""Canonical column-lineage edge derivation.

Spark-native re-expression of the reference's postprocess
(extractor/lineage_postprocess.py:47-118): every column record with
`derived_from` becomes edges (src_col -> target_col) attributed to the
owning (script, df). The reference's intent is that all four fact kinds
(derived columns, aggregations, group-by keys, joins) feed edges; its
per-df branches 2-4 are dead against real data (SURVEY.md §2A A18) — here
they all flow through the one explode because extraction already normalizes
them into `columns` rows with populated `derived_from`.

Edge source-df attribution uses the extractor's `input_dfs` (the fluent
chain base + join right sides) instead of the reference's lag-order
heuristic (lineage_postprocess.py:27-44).

Scale notes: explode + join + dropDuplicates — one shuffle keyed on
(script, df); dedup mirrors lineage_postprocess.py:106-117 via array_sort +
dropDuplicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edges_table(columns: DataFrame, dataframes: DataFrame) -> DataFrame:
    """columns/dataframes fact tables -> canonical edge table
    (script_name, df_name, target_col, src_df, src_col, reason)."""
    exploded = (
        columns.filter(F.size("derived_from") > 0)
        .select(
            "script_name",
            "df_name",
            F.col("col_name").alias("target_col"),
            "transformation",
            F.explode("derived_from").alias("src_col"),
        )
    )
    primary_input = dataframes.select(
        "script_name",
        "df_name",
        # F.get is null-tolerant on empty arrays (ANSI mode is on by default
        # in Spark 4; element_at would throw INVALID_ARRAY_INDEX)
        F.coalesce(F.get("input_dfs", 0), F.col("df_name")).alias("src_df"),
    )
    edges = (
        exploded.join(primary_input, ["script_name", "df_name"], "left")
        .withColumn(
            "reason",
            F.concat_ws(
                ": ", F.col("script_name"), F.concat_ws(" ", "transformation", "src_col")
            ),
        )
        .select("script_name", "df_name", "target_col", "src_df", "src_col", "reason")
    )
    return edges.dropDuplicates(["script_name", "df_name", "target_col", "src_col"])
