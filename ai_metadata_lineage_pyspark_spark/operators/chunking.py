"""Context-window chunking over the `documents` table: the prep step every
RAG / pretraining pipeline runs between raw documents and an embedder or
tokenizer with a bounded input width.

Two granularities, both as pure narrow plans (explode + substring/slice —
zero shuffles, zero UDFs, linear in corpus size):

* `doc_chunking` — fixed CHAR windows with overlap. Chunk i of a document
  covers bytes [i*stride, i*stride + size); chunks exist while their start
  lies inside the text, so every chunk is non-empty and the tail chunk may
  be short. The chunk-count per row is ceil(len/stride), bounded by the
  longest document — fan-out is data-proportional, never quadratic.
* `token_chunking` — fixed TOKEN windows with overlap: split once on
  whitespace, then `slice()` the token array per chunk. This is the
  tokenizer-aligned variant (a 32-token window with 8-token overlap is the
  miniature of a 2048-token window with 256-token overlap at production
  scale); the join-free slice keeps the token array in one projection so
  the splitter runs once per document, not once per chunk.

Chunk text leaves the operator as md5 fingerprints plus lengths (what a
downstream dedup/shard step keys on), keeping output rows narrow; the
substring math itself is the operator under test. At 100 TB both plans are
embarrassingly parallel map work over the document scan — the shapes that
survive are exactly these: no window functions, no joins, fan-out bounded
by document length.

Reference parity: the reference chunks its corpus driver-side per document
(qa/build_corpus.py builds one doc per asset/script — SURVEY §2A A24-A27);
these operators generalize that to bounded-width windows for real corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.io import load
from ..registry import register

_CHUNK_CHARS = 200
_STRIDE_CHARS = 150  # 50-char overlap

_CHUNK_TOKS = 32
_STRIDE_TOKS = 24  # 8-token overlap


@register(
    "doc_chunking",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, text, length(text) AS n FROM documents
    ),
    c AS (
      SELECT doc_id, n,
        unnest(generate_series(0, (n - 1) // {_STRIDE_CHARS})) AS chunk_id,
        text
      FROM d
    )
    SELECT doc_id,
      CAST(chunk_id AS BIGINT) AS chunk_id,
      CAST(chunk_id * {_STRIDE_CHARS} AS BIGINT) AS chunk_start,
      CAST(length(substr(text, chunk_id * {_STRIDE_CHARS} + 1, {_CHUNK_CHARS}))
        AS BIGINT) AS chunk_len,
      md5(substr(text, chunk_id * {_STRIDE_CHARS} + 1, {_CHUNK_CHARS}))
        AS chunk_hash,
      chunk_id * {_STRIDE_CHARS} + {_CHUNK_CHARS} >= n AS is_tail
    FROM c
    """,
)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-char chunking: 200-char windows every 150 chars.

    Plan shape: scan -> explode(sequence) -> one projection. The sequence
    bound is computed from length(text) so the explode fan-out is exactly
    the chunk count — no over-generation + filter."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "text", F.length("text").alias("n")
    )
    chunks = d.select(
        "doc_id",
        "text",
        "n",
        F.expr(f"explode(sequence(0, (n - 1) div {_STRIDE_CHARS}))").alias("chunk_id"),
    )
    chunk = F.expr(f"substr(text, chunk_id * {_STRIDE_CHARS} + 1, {_CHUNK_CHARS})")
    return chunks.select(
        "doc_id",
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        (F.col("chunk_id") * _STRIDE_CHARS).cast("bigint").alias("chunk_start"),
        F.length(chunk).cast("bigint").alias("chunk_len"),
        F.md5(chunk).alias("chunk_hash"),
        (F.col("chunk_id") * _STRIDE_CHARS + _CHUNK_CHARS >= F.col("n")).alias(
            "is_tail"
        ),
    )


@register(
    "token_chunking",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
        string_split_regex(trim(text), '\\s+') AS toks
      FROM documents
      WHERE length(trim(text)) > 0
    ),
    c AS (
      SELECT doc_id, toks, len(toks) AS nt,
        unnest(generate_series(0, (len(toks) - 1) // {_STRIDE_TOKS})) AS chunk_id
      FROM d
    )
    SELECT doc_id,
      CAST(chunk_id AS BIGINT) AS chunk_id,
      CAST(len(toks[chunk_id * {_STRIDE_TOKS} + 1 :
                   chunk_id * {_STRIDE_TOKS} + {_CHUNK_TOKS}]) AS BIGINT)
        AS n_tokens,
      md5(array_to_string(
        toks[chunk_id * {_STRIDE_TOKS} + 1 :
             chunk_id * {_STRIDE_TOKS} + {_CHUNK_TOKS}], ' ')) AS chunk_hash
    FROM c
    """,
)
def token_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking: 32-token windows every 24 tokens.

    The whitespace split runs ONCE per document in the pre-explode
    projection; each chunk is a `slice()` of that array (Spark slice and
    DuckDB list-slicing are both 1-based and both clamp at the array end,
    so the tail chunk shortens identically in both engines)."""
    d = (
        load(spark, sf_dir, "documents")
        .filter(F.length(F.trim(F.col("text"))) > 0)
        .select("doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("toks"))
    )
    chunks = d.select(
        "doc_id",
        "toks",
        F.expr(f"explode(sequence(0, (size(toks) - 1) div {_STRIDE_TOKS}))").alias(
            "chunk_id"
        ),
    )
    sl = F.expr(f"slice(toks, chunk_id * {_STRIDE_TOKS} + 1, {_CHUNK_TOKS})")
    return chunks.select(
        "doc_id",
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.size(sl).cast("bigint").alias("n_tokens"),
        F.md5(F.concat_ws(" ", sl)).alias("chunk_hash"),
    )
