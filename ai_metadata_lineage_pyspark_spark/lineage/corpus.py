"""RAG corpus building: lineage facts -> text documents with content ids.

Spark-native re-expression of qa/build_corpus.py:
  * script summary docs (build_script_doc, :50-79)
  * lineage-edge docs (build_lineage_edge_docs, :82-120 — the reference's
    builder is schema-mismatched and yields zero docs against real data
    (SURVEY.md §2A A25); here the intended join on the real edge schema is
    implemented)
  * derived / aggregation / join docs (build_bedrock_docs, :123-198)

Doc ids are sha256(text) (the reference uses sha1, qa/build_corpus.py:33-35;
sha256 here — divergence documented). Everything is projections +
unionByName: no shuffle except the per-script collect_list for summaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_id(df: DataFrame) -> DataFrame:
    return df.select(
        F.sha2(F.col("text"), 256).alias("doc_id"), "doc_type", "ref", "text"
    )


def script_docs(assets: DataFrame, dataframes: DataFrame) -> DataFrame:
    reads = (
        assets.filter(F.col("direction") == "read")
        .groupBy("script_name")
        .agg(F.sort_array(F.collect_list(F.concat_ws(" ", "format", "path"))).alias("reads"))
    )
    writes = (
        assets.filter(F.col("direction") == "write")
        .groupBy("script_name")
        .agg(F.sort_array(F.collect_list(F.concat_ws(" ", "format", "path"))).alias("writes"))
    )
    dfs = dataframes.groupBy("script_name").agg(
        F.sort_array(F.collect_list(F.concat_ws("=", "df_name", "df_type"))).alias("dfs")
    )
    return _with_id(
        dfs.join(reads, "script_name", "left")
        .join(writes, "script_name", "left")
        .select(
            F.lit("script").alias("doc_type"),
            F.col("script_name").alias("ref"),
            F.concat_ws(
                "\n",
                F.concat(F.lit("SCRIPT: "), F.col("script_name")),
                F.concat(F.lit("READS: "), F.array_join(F.coalesce("reads", F.array()), "; ")),
                F.concat(F.lit("WRITES: "), F.array_join(F.coalesce("writes", F.array()), "; ")),
                F.concat(F.lit("DATAFRAMES: "), F.array_join("dfs", "; ")),
            ).alias("text"),
        )
    )


def edge_docs(edges: DataFrame) -> DataFrame:
    return _with_id(
        edges.select(
            F.lit("lineage_edge").alias("doc_type"),
            F.concat_ws(".", "script_name", "df_name", "target_col").alias("ref"),
            F.concat(
                F.lit("LINEAGE "),
                F.col("script_name"),
                F.lit("."),
                F.col("df_name"),
                F.lit(": "),
                F.col("src_col"),
                F.lit(" -> "),
                F.col("target_col"),
            ).alias("text"),
        )
    )


def column_docs(columns: DataFrame) -> DataFrame:
    """Docs for derived / aggregation / join column facts."""
    typed = columns.withColumn(
        "doc_type",
        F.when(F.col("transformation") == "aggregation", "aggregation")
        .when(F.col("transformation") == "join", "join")
        .otherwise("derived"),
    ).filter(F.col("transformation") != "groupByKey")
    return _with_id(
        typed.select(
            "doc_type",
            F.concat_ws(".", "script_name", "df_name", "col_name").alias("ref"),
            F.concat(
                F.upper(F.col("doc_type")),
                F.lit(" "),
                F.col("script_name"),
                F.lit("."),
                F.col("df_name"),
                F.lit("."),
                F.col("col_name"),
                F.lit(" = "),
                F.col("expression"),
                F.lit(" FROM ["),
                F.array_join("derived_from", ", "),
                F.lit("]"),
            ).alias("text"),
        )
    )


def build_corpus(
    assets: DataFrame, dataframes: DataFrame, columns: DataFrame, edges: DataFrame
) -> DataFrame:
    """Full corpus: script + lineage_edge + derived/aggregation/join docs."""
    return (
        script_docs(assets, dataframes)
        .unionByName(edge_docs(edges))
        .unionByName(column_docs(columns))
        .dropDuplicates(["doc_id"])
    )
