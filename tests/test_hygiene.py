"""Invariant tests for the corpus-hygiene operators and the foreachBatch
upsert (bounds and re-entrancy; exact values are covered by the DuckDB
oracle gate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_metadata_lineage_pyspark_spark.registry import all_queries


def _run(name, spark, sf_dir):
    return all_queries()[name].fn(spark, sf_dir)


def test_classifier_score_is_bounded_mean(spark, sf_dir):
    df = _run("quality_classifier_score", spark, sf_dir)
    bad = df.filter(
        (F.col("n_tokens") <= 0)
        | (F.col("score") < -1000)
        | (F.col("score") > 1000)
        | (F.abs(F.col("score") * F.col("n_tokens") - F.col("weight_sum")) > 1e-6)
    )
    assert bad.count() == 0


def test_intradoc_windows_bounds(spark, sf_dir):
    df = _run("intradoc_window_dedup", spark, sf_dir)
    bad = df.filter(
        (F.col("n_distinct") > F.col("n_windows"))
        | (F.col("n_distinct") < 0)
        | (F.col("dup_ratio") < 0)
        | (F.col("dup_ratio") > 1)
        | (F.col("n_dup_windows") != F.col("n_windows") - F.col("n_distinct"))
    )
    assert bad.count() == 0


def test_pii_redact_fires_on_fixture(spark, sf_dir):
    df = _run("pii_redact", spark, sf_dir)
    agg = df.agg(
        F.sum("n_denylist").alias("deny"),
        F.sum(F.col("redacted_hash").isNull().cast("int")).alias("null_hashes"),
    ).first()
    # the denylist terms occur in the synthetic corpus; regex classes may be 0
    assert agg["deny"] > 0
    assert agg["null_hashes"] == 0


def test_lang_mix_allocation_sums_to_one_million(spark, sf_dir):
    rows = _run("lang_mix_allocation", spark, sf_dir).collect()
    total_ppm = sum(r["alloc_ppm"] for r in rows)
    # floor-division loses < 1 ppm per language
    assert 1_000_000 - len(rows) <= total_ppm <= 1_000_000
    assert all(r["w_micro"] > 0 for r in rows)


def test_foreach_upsert_is_reentrant(spark, sf_dir):
    first = {
        r["user_id"]: (r["latest_event_id"], r["n_events"])
        for r in _run("streaming_foreach_upsert", spark, sf_dir).collect()
    }
    second = {
        r["user_id"]: (r["latest_event_id"], r["n_events"])
        for r in _run("streaming_foreach_upsert", spark, sf_dir).collect()
    }
    assert first == second and len(first) > 0


def test_event_chain_leads_matches_bfs(spark, sf_dir):
    """The structure-aware rewrite must enumerate the identical closure."""
    bfs = {
        (r["seed"], r["node"], r["depth"])
        for r in _run("event_chain_closure", spark, sf_dir).collect()
    }
    leads = {
        (r["seed"], r["node"], r["depth"])
        for r in _run("event_chain_leads", spark, sf_dir).collect()
    }
    assert bfs == leads and len(leads) > 0
