"""Deterministic sampling operators for training-data pipelines:
stratified downsampling and train/val/test splitting over `documents`.

Beyond-reference surface (BASELINE.json north-star). Both operators key
every decision on a content-independent md5 of the stable doc_id — NOT on
`rand()` or Spark's engine-specific `hash()` — so:

* the sample is reproducible across runs, engines (the DuckDB oracle
  replays it exactly), partitionings and cluster sizes;
* re-running over a grown corpus keeps previously-selected rows selected
  (per-row decision, no global state);
* there is no shuffle at all — both are pure scan + filter/project, the
  ideal 100 TB shape. Per-stratum rates are a tiny broadcast map (a CASE
  expression here).

`pmod(('0x' || md5[:8]), 100)` is uniform over [0, 100) for md5's output
distribution, so a rate of r% keeps ≈ r% of each stratum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.io import load
from ..registry import register

# md5-derived bucket in [0, 100): identical expression in both engines.
_BUCKET_SPARK = (
    "pmod(cast(conv(substr(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint), 100)"
)
_BUCKET_SQL = "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100)"

# stratified rates: downsample the dominant language, keep the tail.
_RATES = {"en": 20, "de": 60, "fr": 60}
_DEFAULT_RATE = 90


def _rate_case_spark() -> str:
    whens = " ".join(f"WHEN '{k}' THEN {v}" for k, v in _RATES.items())
    return f"CASE lang {whens} ELSE {_DEFAULT_RATE} END"


@register(
    "stratified_sample",
    bench=True,
    oracle=f"""
    WITH s AS (
      SELECT lang, doc_id, n_chars, {_BUCKET_SQL} AS bucket,
        CASE lang WHEN 'en' THEN 20 WHEN 'de' THEN 60 WHEN 'fr' THEN 60
                  ELSE {_DEFAULT_RATE} END AS rate
      FROM documents
    )
    SELECT lang,
      COUNT(*) AS n_total,
      COUNT(*) FILTER (WHERE bucket < rate) AS n_sampled,
      MIN(doc_id) FILTER (WHERE bucket < rate) AS min_sampled_doc,
      SUM(n_chars) FILTER (WHERE bucket < rate) AS sampled_chars
    FROM s
    GROUP BY lang
    """,
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language stratified downsampling with deterministic hash gates:
    keep a row iff its md5 bucket falls under the stratum's rate. Zero
    shuffle for the sample itself; the rollup here exists to make the
    selection auditable (and oracle-checkable) as counts per stratum."""
    docs = load(spark, sf_dir, "documents")
    s = docs.select(
        "lang",
        "doc_id",
        "n_chars",
        F.expr(_BUCKET_SPARK).alias("bucket"),
        F.expr(_rate_case_spark()).alias("rate"),
    )
    keep = F.col("bucket") < F.col("rate")
    return s.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(keep, 1)).alias("n_sampled"),
        F.min(F.when(keep, F.col("doc_id"))).alias("min_sampled_doc"),
        F.sum(F.when(keep, F.col("n_chars"))).alias("sampled_chars"),
    )


@register(
    "train_val_test_split",
    oracle=f"""
    WITH s AS (
      SELECT lang, n_chars, {_BUCKET_SQL} AS bucket FROM documents
    ),
    labeled AS (
      SELECT lang, n_chars,
        CASE WHEN bucket < 80 THEN 'train'
             WHEN bucket < 90 THEN 'val'
             ELSE 'test' END AS split
      FROM s
    )
    SELECT split, lang, COUNT(*) AS n_docs, SUM(n_chars) AS total_chars
    FROM labeled
    GROUP BY split, lang
    """,
)
def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment from the same md5 bucket: every
    row's split is a pure function of its id, so splits are stable under
    reprocessing and corpus growth (no leakage from rows migrating between
    splits). Output is the per-(split, lang) audit rollup."""
    docs = load(spark, sf_dir, "documents")
    s = docs.select("lang", "n_chars", F.expr(_BUCKET_SPARK).alias("bucket"))
    labeled = s.select(
        "lang",
        "n_chars",
        F.when(F.col("bucket") < 80, "train")
        .when(F.col("bucket") < 90, "val")
        .otherwise("test")
        .alias("split"),
    )
    return labeled.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )
