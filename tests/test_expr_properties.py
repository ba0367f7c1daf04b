"""Property tests for the per-row expression folds (hypothesis): the Spark
SQL expressions must agree with a plain-Python reference on arbitrary token
lists, not just fixture text. Complements tests/test_extract_properties.py
(AST extractor) per the SURVEY §5 strategy of property-testing the pure
per-row kernels."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ai_metadata_lineage_pyspark_spark.operators.text import _BIGRAMS, _TOP_RUN_FOLD

_TOKENS_ST = st.lists(
    st.sampled_from(["a", "b", "ab", "x", "long-token", ""]), min_size=1, max_size=30
)

_SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _eval_over_toks(spark, toks, expr):
    df = spark.createDataFrame([(toks,)], "toks: array<string>")
    return df.selectExpr(f"{expr} AS out").collect()[0]["out"]


@given(toks=_TOKENS_ST)
@_SETTINGS
def test_top_run_fold_equals_counter_max(spark, toks):
    got = _eval_over_toks(spark, toks, _TOP_RUN_FOLD)
    assert got == max(Counter(toks).values())


@given(toks=st.lists(st.sampled_from(["a", "b", "c"]), min_size=2, max_size=25))
@_SETTINGS
def test_distinct_bigram_count_matches_python(spark, toks):
    got = _eval_over_toks(spark, toks, f"size(array_distinct({_BIGRAMS}))")
    expect = len({(toks[i], toks[i + 1]) for i in range(len(toks) - 1)})
    assert got == expect


@given(doc_id=st.integers(min_value=0, max_value=2**40))
@_SETTINGS
def test_sample_bucket_in_range_and_deterministic(spark, doc_id):
    from ai_metadata_lineage_pyspark_spark.operators.sampling import _BUCKET_SPARK

    df = spark.createDataFrame([(doc_id,)], "doc_id: long")
    a = df.selectExpr(f"{_BUCKET_SPARK} AS b").collect()[0]["b"]
    b = df.selectExpr(f"{_BUCKET_SPARK} AS b").collect()[0]["b"]
    assert a == b
    assert 0 <= a < 100
