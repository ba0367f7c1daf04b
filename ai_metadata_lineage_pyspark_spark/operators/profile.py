"""Corpus/table profiling operators: global vocabulary and per-group column
statistics — the "know your data" layer of a training pipeline.

corpus_vocabulary is the canonical wordcount shape: explode -> groupBy(token)
with map-side partial aggregation (hot stopword-like tokens are exactly the
case partial agg exists for), then a deterministic top-k via
TakeOrderedAndProject — no full-sort shuffle for a LIMIT.

table_profile computes per-group count / min / max / exact percentiles /
decimal-safe mean. Exact `percentile` is used because it is bit-identical to
DuckDB's quantile_cont (verified: linear interpolation over the sorted
values); at 100 TB you swap in `approx_percentile` (t-digest sketch, no
per-group sort) — the query shape is unchanged. The mean aggregates in
DECIMAL and casts to DOUBLE at the boundary: summing doubles directly is
partition-order-dependent and not reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.io import fan_out, load
from ..registry import register
from .text import _TOKENS

_TOP_K_TOKENS = 50


@register(
    "corpus_vocabulary",
    oracle=f"""
    WITH x AS (
      SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS token
      FROM documents
    )
    SELECT token,
      COUNT(*) AS n_occurrences,
      COUNT(DISTINCT doc_id) AS n_docs
    FROM x
    GROUP BY token
    ORDER BY n_occurrences DESC, token ASC
    LIMIT {_TOP_K_TOKENS}
    """,
)
def corpus_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} corpus tokens by occurrence count, with document frequency.
    Deterministic total order (count DESC, token ASC) so the top-k boundary
    is stable across engines and partitionings."""
    docs = fan_out(load(spark, sf_dir, "documents"))
    x = docs.selectExpr("doc_id", f"explode({_TOKENS}) AS token")
    return (
        x.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.col("n_occurrences").desc(), F.col("token").asc())
        .limit(_TOP_K_TOKENS)
    )


@register(
    "table_profile",
    oracle="""
    SELECT l_returnflag,
      COUNT(*) AS n_rows,
      MIN(l_quantity) AS min_qty,
      MAX(l_quantity) AS max_qty,
      quantile_cont(l_quantity, 0.5) AS med_qty,
      quantile_cont(l_quantity, 0.9) AS p90_qty,
      quantile_cont(l_extendedprice, 0.5) AS med_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        AS mean_price,
      COUNT(DISTINCT l_partkey) AS n_parts
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag profile of lineitem: counts, extrema, exact median/p90
    (swap to approx_percentile at scale), decimal-safe mean, distinct parts."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.expr("percentile(l_quantity, 0.5)").alias("med_qty"),
        F.expr("percentile(l_quantity, 0.9)").alias("p90_qty"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("med_price"),
        (
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_price"),
        F.countDistinct("l_partkey").alias("n_parts"),
    )


@register("table_profile_approx", oracle=None)  # rows-only: sketch output
def table_profile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documented 100 TB swap for `table_profile`: `approx_percentile`
    (t-digest-style sketch, mergeable partial state, NO per-group sort)
    replaces exact `percentile`. Registered rows-only by design — the
    sketch's answers are accuracy-bounded, not bit-reproducible across
    engines; tests/test_approx.py pins the error bound against the exact
    operator instead. Shape and column contract are identical to
    table_profile, so a caller flips one name at scale."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.expr("approx_percentile(l_quantity, 0.5, 10000)").alias("med_qty"),
        F.expr("approx_percentile(l_quantity, 0.9, 10000)").alias("p90_qty"),
        F.expr("approx_percentile(l_extendedprice, 0.5, 10000)").alias("med_price"),
        (
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_price"),
        F.expr("approx_count_distinct(l_partkey)").alias("n_parts"),
    )


# ---------------------------------------------------------------------------
# embedding_dim_stats — per-dimension distribution profile of the embedding
# column: the sanity pass every vector pipeline runs before indexing
# (dead dimensions, scale drift between model versions, outlier dims that
# dominate L2 distance). Values are fixed-pointed to integer micro-units
# (floor(v * 1e6)) BEFORE aggregation, so every sum is exact integer
# arithmetic and the cross-engine hash cannot drift on float summation
# order; mean/variance leave as IEEE-double expressions over those exact
# integer sums, identical in both engines.
# ---------------------------------------------------------------------------


@register(
    "embedding_dim_stats",
    oracle="""
    WITH u AS (
      SELECT generate_subscripts(embedding, 1) AS dim, unnest(embedding) AS v
      FROM embeddings
    ),
    m AS (
      SELECT dim,
        CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT) AS v_micro
      FROM u
    )
    SELECT CAST(dim AS BIGINT) AS dim,
      CAST(COUNT(*) AS BIGINT) AS n_values,
      CAST(SUM(v_micro) AS BIGINT) AS sum_micro,
      CAST(MIN(v_micro) AS BIGINT) AS min_micro,
      CAST(MAX(v_micro) AS BIGINT) AS max_micro,
      CAST(SUM(v_micro) AS DOUBLE) / COUNT(*) AS mean_micro,
      (CAST(SUM(v_micro * v_micro) AS DOUBLE)
        - CAST(SUM(v_micro) AS DOUBLE) * CAST(SUM(v_micro) AS DOUBLE) / COUNT(*))
        / COUNT(*) AS var_micro2
    FROM m
    GROUP BY dim
    """,
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension count/sum/min/max/mean/variance over the vector column.

    Plan: posexplode (64 rows per vector) -> groupBy(dim) with map-side
    partial aggregation into 64 groups — the shuffle after partial agg is
    (n_partitions x 64) pre-combined rows regardless of table size, so the
    query is scan-bound at any scale. At 100 TB the BIGINT accumulators
    need headroom: micro-units square to ~1e13 per value, so the sum-of-
    squares column overflows past ~1e6 rows per (partition, dim) group —
    the production swap is DECIMAL(38,0) accumulators (same plan, exact
    arithmetic, ~2x agg cost); counts/min/max are unaffected.

    Determinism: fixed-point micro conversion is floor over an exact
    dyadic double (float->double widening is value-preserving, *1e6 and
    floor are correctly-rounded IEEE ops), so both engines aggregate
    identical integers; the mean/var doubles are then single-expression
    IEEE arithmetic over integers < 2^63, which both engines round
    identically.
    """
    u = load(spark, sf_dir, "embeddings").select(
        F.posexplode("embedding").alias("pos", "v")
    )
    m = u.selectExpr(
        "CAST(pos + 1 AS BIGINT) AS dim",
        "CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT) AS v_micro",
    )
    return m.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n_values"),
        F.sum("v_micro").alias("sum_micro"),
        F.min("v_micro").alias("min_micro"),
        F.max("v_micro").alias("max_micro"),
        F.expr("CAST(SUM(v_micro) AS DOUBLE) / COUNT(*)").alias("mean_micro"),
        F.expr(
            "(CAST(SUM(v_micro * v_micro) AS DOUBLE)"
            " - CAST(SUM(v_micro) AS DOUBLE) * CAST(SUM(v_micro) AS DOUBLE) / COUNT(*))"
            " / COUNT(*)"
        ).alias("var_micro2"),
    )
