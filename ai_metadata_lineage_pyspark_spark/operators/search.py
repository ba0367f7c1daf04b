"""Full-text search primitives over the documents corpus: inverted index
(token -> postings list) and integer-exact TF-IDF top terms per document.

These extend the reference's retrieval layer (SURVEY.md §2A A28/A36 —
embedding KNN over corpus docs, qa/embed_index.py:23-46) with the lexical
half every retrieval stack pairs with vectors: a postings index for keyword
lookup and a TF-IDF ranking for sparse relevance.

Tokenization matches the shared text-operator convention (lower +
whitespace split — operators/text.py).

Scale notes: the index build is explode -> groupBy(token) — one shuffle
keyed by token with map-side partial aggregation; postings lists are
sort_array(collect_list(...)) which stays bounded because document
frequency per token is capped by corpus vocabulary skew (at 100 TB,
stop-token postings would be truncated or tiered — here df is full). TF-IDF
reuses the same exploded frame for term frequencies and document
frequencies; scoring is integer fixed-point (tf * SCALE // df), so ranking
ties are engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.io import load
from ..registry import register

# minimum document frequency for a token to enter the index (drops hapax
# noise and keeps the fixture output readable); TF-IDF uses no floor.
_MIN_DF = 5
_TFIDF_SCALE = 1_000_000
_TOP_TERMS = 3


@register(
    "inverted_index",
    oracle=f"""
    WITH tok AS (
      SELECT DISTINCT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS token
      FROM documents
    )
    SELECT token,
      COUNT(*) AS df,
      list_sort(list(doc_id)) AS postings
    FROM tok
    WHERE token <> ''
    GROUP BY token
    HAVING COUNT(*) >= {_MIN_DF}
    """,
)
def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index: token -> sorted postings list of doc_ids containing
    it (distinct per doc), with document frequency, for tokens appearing in
    at least _MIN_DF documents.

    Plan: explode(split) -> distinct (map-side partial) -> groupBy(token)
    with collect_list; ONE token-keyed shuffle. sort_array makes the
    postings deterministic regardless of shuffle arrival order."""
    docs = load(spark, sf_dir, "documents")
    tok = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower("text"), r"\s+")).alias("token"),
        )
        .filter(F.col("token") != "")
        .distinct()
    )
    return (
        tok.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sort_array(F.collect_list("doc_id")).alias("postings"),
        )
        .filter(F.col("df") >= _MIN_DF)
    )


@register(
    "tfidf_top_terms",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS token
      FROM documents
    ), tf AS (
      SELECT doc_id, token, COUNT(*) AS tf
      FROM tok WHERE token <> ''
      GROUP BY doc_id, token
    ), df AS (
      SELECT token, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, token FROM tf)
      GROUP BY token
    ), scored AS (
      SELECT tf.doc_id, tf.token, tf.tf, df.df,
        CAST(tf.tf * {_TFIDF_SCALE} AS BIGINT) // df.df AS score_fp,
        ROW_NUMBER() OVER (
          PARTITION BY tf.doc_id
          ORDER BY (CAST(tf.tf * {_TFIDF_SCALE} AS BIGINT) // df.df) DESC,
                   tf.token
        ) AS rn
      FROM tf JOIN df ON tf.token = df.token
    )
    SELECT doc_id, token, tf, df, score_fp, rn
    FROM scored WHERE rn <= {_TOP_TERMS}
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer fixed-point TF-IDF: per (doc, token) term frequency joined
    with corpus document frequency; score = tf * SCALE // df (a monotone
    stand-in for tf/df rarity weighting that stays BIGINT-exact, so
    cross-engine ranking cannot diverge on float noise); top-3 terms per
    doc by (score desc, token) via row_number.

    Plan: one explode + (doc,token) groupBy for tf; df derives from tf
    (token-keyed re-aggregation of already-tiny per-doc rows — NOT a second
    corpus scan); df is vocabulary-sized and BROADCASTS back onto tf; the
    top-k window partitions by doc_id, which is the same key tf is already
    hashed on."""
    docs = load(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower("text"), r"\s+")).alias("token"),
        )
        .filter(F.col("token") != "")
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(F.broadcast(df), "token").withColumn(
        "score_fp",
        F.expr(f"CAST(tf * {_TFIDF_SCALE} AS BIGINT) div df"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_fp").desc(), F.col("token")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOP_TERMS)
        .select("doc_id", "token", "tf", "df", "score_fp", "rn")
    )
