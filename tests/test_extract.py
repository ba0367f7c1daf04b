"""Unit tests for the pure-Python AST fact extractor (lineage/extract.py).

These pin the *fixed* semantics where the reference is buggy (SURVEY.md §2A
quirks A7/A10/A11/A12/A13) — each divergence gets an explicit test so the
behavior is documented and can't regress silently.
"""

from __future__ import annotations

import textwrap

from ai_metadata_lineage_pyspark_spark.lineage.extract import extract_script_facts


def extract(src: str) -> dict:
    return extract_script_facts("t", textwrap.dedent(src))


def test_read_through_option_chain_keeps_terminal_format():
    # Reference quirk A7: spark.read.option(...) chains emitted a bogus
    # {"format": "option", "path": "header"} read. We keep the terminal
    # reader method as the format and resolve the real path.
    f = extract(
        """
        path = "s3a://lake/raw/"
        df = spark.read.option("header", "true").option("inferSchema", "true").csv(path)
        """
    )
    assert f["assets"] == [
        {
            "direction": "read",
            "format": "csv",
            "path": "s3a://lake/raw/",
            "df_name": "df",
            "partition_by": [],
        }
    ]


def test_write_through_chained_writer_resolves_df_name():
    # Reference quirk A12: chained writers recorded df name "parquet".
    f = extract(
        """
        df = spark.read.parquet("in")
        df.write.mode("overwrite").partitionBy("d", "h").parquet("out")
        """
    )
    (write,) = [a for a in f["assets"] if a["direction"] == "write"]
    assert write["df_name"] == "df"
    assert write["format"] == "parquet"
    assert write["path"] == "out"
    assert write["partition_by"] == ["d", "h"]


def test_temp_view_is_not_a_write():
    # Reference quirk A12: createOrReplaceTempView was mis-captured as a
    # write with format "createOrReplaceTempView".
    f = extract(
        """
        df = spark.read.parquet("in")
        df.createOrReplaceTempView("v")
        """
    )
    assert [a for a in f["assets"] if a["direction"] == "write"] == []
    assert f["temp_views"] == [{"view_name": "v", "df_name": "df"}]


def test_source_sink_by_usage_not_assignment_order():
    # Reference quirk A13: first/last-assignment-order heuristic marked
    # `spark = SparkSession...` as the sink. Classification here is by
    # actual read/write usage.
    f = extract(
        """
        a = spark.read.parquet("in")
        b = a.withColumn("x", F.col("y"))
        b.write.parquet("out")
        c = b.withColumn("z", F.col("x"))
        """
    )
    types = {d["df_name"]: d["df_type"] for d in f["dataframes"]}
    assert types == {"a": "source", "b": "sink", "c": "intermediate"}


def test_all_agg_functions_yield_derived_from():
    # Reference quirk A10: only F.sum got derived_from. All agg fns do here.
    f = extract(
        """
        df = spark.read.parquet("in")
        g = df.groupBy("k").agg(
            F.sum("a").alias("s"),
            F.min("b").alias("mn"),
            F.countDistinct("c").alias("cd"),
            F.avg("d").alias("av"),
        )
        """
    )
    aggs = {c["col_name"]: c for c in f["columns"] if c["transformation"] == "aggregation"}
    assert aggs["s"]["derived_from"] == ["a"]
    assert aggs["mn"]["derived_from"] == ["b"]
    assert aggs["cd"]["derived_from"] == ["c"]
    assert aggs["av"]["derived_from"] == ["d"]
    key = [c for c in f["columns"] if c["transformation"] == "groupByKey"]
    assert key[0]["col_name"] == "k" and key[0]["derived_from"] == ["k"]


def test_join_positional_and_kwarg_forms():
    # Reference quirk A11: only kwarg on=/how= string literals were captured.
    f = extract(
        """
        a = spark.read.parquet("a")
        b = spark.read.parquet("b")
        j1 = a.join(b, "k", "left")
        j2 = a.join(b, on=["k1", "k2"], how="inner")
        """
    )
    joins = {c["df_name"]: c for c in f["columns"] if c["transformation"] == "join"}
    assert joins["j1"]["derived_from"] == ["k"]
    assert "how='left'" in joins["j1"]["expression"]
    assert joins["j2"]["derived_from"] == ["k1", "k2"]
    df_inputs = {d["df_name"]: d["input_dfs"] for d in f["dataframes"]}
    assert df_inputs["j1"] == ["a", "b"]


def test_join_expression_condition_captured_as_text():
    f = extract(
        """
        a = spark.read.parquet("a")
        b = spark.read.parquet("b")
        j = a.join(b, F.col("a.k") == F.col("b.k"), "left")
        """
    )
    (join,) = [c for c in f["columns"] if c["transformation"] == "join"]
    assert join["derived_from"] == []
    assert "F.col('a.k') == F.col('b.k')" in join["expression"]


def test_path_resolution_through_constant_table():
    # A6: `out = "s3a://…"` assigned earlier then used as parquet(out).
    f = extract(
        """
        out = "s3a://lake/gold/x/"
        df = spark.read.parquet("in")
        df.write.parquet(out)
        """
    )
    (write,) = [a for a in f["assets"] if a["direction"] == "write"]
    assert write["path"] == "s3a://lake/gold/x/"


def test_withcolumn_derived_from_excludes_literals():
    f = extract(
        """
        df = spark.read.parquet("in")
        d = df.withColumn("x", F.coalesce(F.col("a").cast("double"), F.lit(0.0)))
        """
    )
    (col,) = [c for c in f["columns"] if c["col_name"] == "x"]
    assert col["derived_from"] == ["a"]


def test_sql_blocks_and_body_nested_in_function():
    # Extraction descends into function bodies (fixture pipelines wrap
    # everything in main(spark)).
    f = extract(
        """
        def main(spark):
            df = spark.read.parquet("in")
            df.createOrReplaceTempView("v")
            out = spark.sql("SELECT k, SUM(x) AS sx FROM v GROUP BY k")
            out.write.parquet("gold")
        """
    )
    assert f["sql_blocks"] == [{"df_name": "out", "sql": "SELECT k, SUM(x) AS sx FROM v GROUP BY k"}]
    assert [a["path"] for a in f["assets"]] == ["in", "gold"]


def test_syntax_error_yields_parse_ok_false():
    f = extract("def broken(:")
    assert f["parse_ok"] is False
    assert f["assets"] == [] and f["columns"] == []
