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
      CAST(SUM(n_chars) FILTER (WHERE bucket < rate) AS BIGINT) AS sampled_chars
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


_PACK_BLOCK = 200  # docs per packing block
_PACK_BUDGET = 2000  # token budget per shard


@register(
    "shard_packing",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, doc_id // {_PACK_BLOCK} AS block,
        len(regexp_split_to_array(lower(text), '\\s+')) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT *, CAST(SUM(n_tokens) OVER (PARTITION BY lang, block ORDER BY doc_id
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM t
    ),
    s AS (SELECT *, CAST((cum - n_tokens) // {_PACK_BUDGET} AS BIGINT) AS shard_id FROM c)
    SELECT lang, block, shard_id,
      COUNT(*) AS n_docs,
      CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens,
      MIN(doc_id) AS min_doc_id,
      MAX(doc_id) AS max_doc_id
    FROM s
    GROUP BY lang, block, shard_id
    """,
)
def shard_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget shard packing (training-sequence packing): docs are
    greedily packed in id order until each shard's cumulative token count
    crosses the budget; a doc starts a new shard when the running total
    before it already filled the current one.

    Packing is a prefix-sum, inherently sequential — so it runs inside
    bounded (lang, block) partitions that pack independently in parallel.
    That is the 100 TB design: a single global orderBy would serialize the
    whole corpus through one partition; block-local packing keeps shards
    deterministic AND embarrassingly parallel, at the cost of at most one
    underfull shard per block."""
    docs = load(spark, sf_dir, "documents")
    from pyspark.sql import Window

    t = docs.select(
        "doc_id",
        "lang",
        F.expr(f"doc_id div {_PACK_BLOCK}").alias("block"),
        F.expr("size(split(lower(text), '\\\\s+'))").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("lang", "block")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s = t.withColumn("cum", F.sum("n_tokens").over(w)).withColumn(
        "shard_id", F.expr(f"(cum - n_tokens) div {_PACK_BUDGET}")
    )
    return s.groupBy("lang", "block", "shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("shard_tokens"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
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
    SELECT split, lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
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
