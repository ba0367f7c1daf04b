"""Chunking invariants that the oracle hash can't express directly:
coverage (chunks reconstruct the document), overlap width, and bounds.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_metadata_lineage_pyspark_spark.functions.io import load
from ai_metadata_lineage_pyspark_spark.operators.chunking import (
    _CHUNK_CHARS,
    _CHUNK_TOKS,
    _STRIDE_CHARS,
    _STRIDE_TOKS,
    doc_chunking,
    token_chunking,
)


def test_doc_chunking_covers_every_char(spark, sf_dir):
    """Union of [chunk_start, chunk_start+chunk_len) must equal [0, len):
    consecutive starts differ by the stride (< chunk size, so no gaps) and
    the final chunk must reach the end of the text."""
    chunks = doc_chunking(spark, sf_dir)
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("n")
    )
    per_doc = (
        chunks.groupBy("doc_id")
        .agg(
            F.min("chunk_start").alias("first_start"),
            F.max(F.col("chunk_start") + F.col("chunk_len")).alias("covered_end"),
            F.count(F.lit(1)).alias("n_chunks"),
            F.max("chunk_start").alias("last_start"),
            F.sum(F.when(F.col("is_tail"), 1).otherwise(0)).alias("n_tail"),
        )
        .join(docs, "doc_id")
    )
    bad = per_doc.filter(
        (F.col("first_start") != 0)
        | (F.col("covered_end") != F.col("n"))
        # starts form an arithmetic sequence: max start == (count-1)*stride
        | (F.col("last_start") != (F.col("n_chunks") - 1) * _STRIDE_CHARS)
        # every chunk start must lie inside the text (non-empty chunk)
        | (F.col("last_start") >= F.col("n"))
        | (F.col("n_tail") < 1)
    )
    assert bad.count() == 0


def test_doc_chunking_len_bounds(spark, sf_dir):
    chunks = doc_chunking(spark, sf_dir)
    assert chunks.filter(
        (F.col("chunk_len") < 1) | (F.col("chunk_len") > _CHUNK_CHARS)
    ).count() == 0
    # non-tail chunks are exactly full-width
    assert chunks.filter(
        ~F.col("is_tail") & (F.col("chunk_len") != _CHUNK_CHARS)
    ).count() == 0


def test_token_chunking_counts(spark, sf_dir):
    """Chunk count per doc is ceil(n_tokens / stride); every chunk holds at
    least 1 and at most CHUNK_TOKS tokens; total tokens across chunks equals
    n_tokens + overlap double-counting ((n_chunks-1) * overlap, except the
    tail which may shorten below a full overlap)."""
    chunks = token_chunking(spark, sf_dir)
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("nt"),
    )
    per_doc = (
        chunks.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_chunks"), F.max("n_tokens").alias("max_t"),
             F.min("n_tokens").alias("min_t"))
        .join(docs, "doc_id")
    )
    bad = per_doc.filter(
        (F.col("n_chunks") != F.floor((F.col("nt") - 1) / _STRIDE_TOKS) + 1)
        | (F.col("max_t") > _CHUNK_TOKS)
        | (F.col("min_t") < 1)
    )
    assert bad.count() == 0


def test_chunking_plan_is_narrow(spark, sf_dir):
    """No shuffle anywhere: chunking must be a pure map-side plan."""
    for fn in (doc_chunking, token_chunking):
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"{fn.__name__} plan shuffles:\n{plan}"
