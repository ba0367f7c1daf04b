"""Benchmark decontamination: flag training documents that share n-gram
shingles with a held-out evaluation set.

Test-set contamination silently inflates benchmark scores, so removing (or
at least flagging) training docs that overlap the eval set is a standard
step in a pretraining-data pipeline. The overlap test here is exact
3-token-shingle overlap — the same shingle definition the MinHash dedup
family uses (operators/dedup.py), so one shingling pass can feed both at
scale.

Fixture protocol: the "benchmark" is the deterministic slice
`doc_id % 50 == 0` of `documents` (~2% of the corpus), standing in for an
external eval table with the same schema.

100 TB design: the eval side is benchmark-sized (thousands of docs, not
billions) — its distinct shingle set broadcasts, so the training corpus is
ONE scan + broadcast-hash semi-style join on the shingle, no shuffle of the
big side. The per-doc rollup then groups only surviving (contaminated)
rows. Never join train-to-train; contamination is train x eval only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.io import fan_out, load
from ..registry import register
from .dedup import _SHINGLES_FROM_TOKS, _SQL_SHINGLES, _SQL_TOKENS, _TOKENS

_EVAL_MOD = 50


@register(
    "benchmark_decontam",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, {_SQL_SHINGLES} AS shingles
      FROM documents
      WHERE len({_SQL_TOKENS}) >= 3
    ),
    x AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    eval_sh AS (
      SELECT doc_id AS eval_id, shingle FROM x WHERE doc_id % {_EVAL_MOD} = 0
    ),
    train_sh AS (
      SELECT doc_id, shingle FROM x WHERE doc_id % {_EVAL_MOD} <> 0
    ),
    totals AS (
      SELECT doc_id, len(shingles) AS n_shingles FROM sh
      WHERE doc_id % {_EVAL_MOD} <> 0
    ),
    hits AS (
      SELECT t.doc_id,
        COUNT(DISTINCT t.shingle) AS n_shared_shingles,
        COUNT(DISTINCT e.eval_id) AS n_eval_docs
      FROM train_sh t JOIN eval_sh e ON t.shingle = e.shingle
      GROUP BY t.doc_id
    )
    SELECT h.doc_id, totals.n_shingles, h.n_shared_shingles, h.n_eval_docs,
      CAST(h.n_shared_shingles AS DOUBLE) / totals.n_shingles AS shared_fraction
    FROM hits h JOIN totals ON h.doc_id = totals.doc_id
    """,
)
def benchmark_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-training-doc contamination report against the eval slice:
    distinct shared shingles, distinct eval docs hit, and the shared
    fraction of the doc's own shingle set."""
    docs = fan_out(load(spark, sf_dir, "documents"))
    sh = (
        docs.selectExpr("doc_id", f"{_TOKENS} AS toks")
        .filter("size(toks) >= 3")
        .selectExpr("doc_id", f"{_SHINGLES_FROM_TOKS} AS shingles")
    )
    is_eval = F.col("doc_id") % _EVAL_MOD == 0
    # shingle arrays are already distinct per doc (array_distinct in the
    # shingler), so exploded rows are distinct (doc, shingle) pairs
    exploded = sh.select("doc_id", F.explode("shingles").alias("shingle"))
    eval_sh = exploded.filter(is_eval).select(
        F.col("doc_id").alias("eval_id"), "shingle"
    )
    train_sh = exploded.filter(~is_eval)
    totals = sh.filter(~is_eval).select("doc_id", F.size("shingles").alias("n_shingles"))
    hits = (
        train_sh.join(F.broadcast(eval_sh), "shingle")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("shingle").alias("n_shared_shingles"),
            F.countDistinct("eval_id").alias("n_eval_docs"),
        )
    )
    return hits.join(totals, "doc_id").select(
        "doc_id",
        F.col("n_shingles").cast("bigint").alias("n_shingles"),
        "n_shared_shingles",
        "n_eval_docs",
        (F.col("n_shared_shingles").cast("double") / F.col("n_shingles")).alias(
            "shared_fraction"
        ),
    )
