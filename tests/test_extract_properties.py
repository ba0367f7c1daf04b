"""Property-based extractor tests: random pipeline scripts from a small
grammar, checked against structural invariants (never crashes, referential
integrity between fact tables, usage-based classification, determinism).
"""

from __future__ import annotations

import hypothesis.strategies as st
from hypothesis import given, settings

from ai_metadata_lineage_pyspark_spark.lineage.extract import extract_script_facts

_NAMES = ["df_a", "df_b", "df_c", "raw", "silver", "gold_mart"]
_COLS = ["amount", "user_id", "ts", "flag", "score"]
_FMTS = ["parquet", "csv", "json"]


@st.composite
def pipeline_script(draw) -> str:
    """A random but well-formed PySpark pipeline script."""
    lines = ["from pyspark.sql import functions as F", ""]
    assigned: list[str] = []
    n_stmts = draw(st.integers(min_value=1, max_value=8))
    for i in range(n_stmts):
        kind = draw(
            st.sampled_from(["read", "transform", "join", "write", "view"])
            if assigned
            else st.sampled_from(["read"])
        )
        if kind == "read":
            name = draw(st.sampled_from(_NAMES)) + f"_{i}"
            fmt = draw(st.sampled_from(_FMTS))
            lines.append(f'{name} = spark.read.{fmt}("s3a://lake/t{i}/")')
            assigned.append(name)
        elif kind == "transform":
            src = draw(st.sampled_from(assigned))
            name = f"t{i}"
            col = draw(st.sampled_from(_COLS))
            lines.append(
                f'{name} = {src}.withColumn("{col}_x", F.col("{col}") * 2)'
            )
            assigned.append(name)
        elif kind == "join" and len(assigned) >= 2:
            left = draw(st.sampled_from(assigned))
            right = draw(st.sampled_from(assigned))
            name = f"j{i}"
            key = draw(st.sampled_from(_COLS))
            how = draw(st.sampled_from(["inner", "left"]))
            lines.append(f'{name} = {left}.join({right}, "{key}", "{how}")')
            assigned.append(name)
        elif kind == "write":
            src = draw(st.sampled_from(assigned))
            lines.append(f'{src}.write.mode("overwrite").parquet("s3a://lake/out{i}/")')
        elif kind == "view":
            src = draw(st.sampled_from(assigned))
            lines.append(f'{src}.createOrReplaceTempView("v{i}")')
    return "\n".join(lines)


@settings(max_examples=60, deadline=None)
@given(pipeline_script())
def test_extraction_invariants(src: str):
    f = extract_script_facts("gen", src)
    assert f["parse_ok"] is True
    df_names = {d["df_name"] for d in f["dataframes"]}
    # referential integrity: every asset/column/view references a known df
    for a in f["assets"]:
        assert a["df_name"] in df_names, (a, src)
        assert a["direction"] in ("read", "write")
        assert a["path"]
    for c in f["columns"]:
        assert c["df_name"] in df_names, (c, src)
    for v in f["temp_views"]:
        assert v["df_name"] in df_names, (v, src)
    # classification is usage-based and consistent
    read_dfs = {a["df_name"] for a in f["assets"] if a["direction"] == "read"}
    written_dfs = {a["df_name"] for a in f["assets"] if a["direction"] == "write"}
    for d in f["dataframes"]:
        if d["df_type"] == "source":
            assert d["df_name"] in read_dfs and d["df_name"] not in written_dfs
        elif d["df_type"] == "sink":
            assert d["df_name"] in written_dfs
        else:
            assert d["df_name"] not in read_dfs | written_dfs
    # orders are unique and positive
    orders = [d["order"] for d in f["dataframes"]]
    assert len(orders) == len(set(orders))
    assert all(o >= 1 for o in orders)
    # input_dfs reference earlier dataframes only
    order_of = {d["df_name"]: d["order"] for d in f["dataframes"]}
    for d in f["dataframes"]:
        for inp in d["input_dfs"]:
            assert inp in df_names
            assert order_of[inp] < d["order"], (d, src)


@settings(max_examples=20, deadline=None)
@given(pipeline_script())
def test_extraction_is_deterministic(src: str):
    assert extract_script_facts("x", src) == extract_script_facts("x", src)


@settings(max_examples=30, deadline=None)
@given(st.text(max_size=400))
def test_arbitrary_text_never_crashes(src: str):
    f = extract_script_facts("junk", src)
    assert isinstance(f["parse_ok"], bool)
