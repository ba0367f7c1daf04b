"""Semantic invariants for the new curation-support operators:
near-dup connected components and benchmark decontamination."""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_metadata_lineage_pyspark_spark.registry import all_queries


def test_components_are_consistent_with_pairs(spark, sf_dir):
    qs = all_queries()
    pairs = qs["minhash_lsh_pairs"].fn(spark, sf_dir).select("doc_a", "doc_b").collect()
    comp = {
        r["doc_id"]: r["component_id"]
        for r in qs["neardup_components"].fn(spark, sf_dir).collect()
    }
    # every pair endpoint is labeled, both endpoints agree, and the label is
    # the minimum doc_id of the member set (canonical-by-min contract)
    for p in pairs:
        assert comp[p["doc_a"]] == comp[p["doc_b"]]
    members: dict[int, list[int]] = {}
    for doc, c in comp.items():
        members.setdefault(c, []).append(doc)
    for c, docs in members.items():
        assert c == min(docs)


def test_components_sizes_and_canonicals(spark, sf_dir):
    df = all_queries()["neardup_components"].fn(spark, sf_dir)
    # exactly one canonical per component, and component_size counts members
    per_comp = df.groupBy("component_id").agg(
        F.sum(F.col("is_canonical").cast("int")).alias("n_canon"),
        F.count(F.lit(1)).alias("n"),
        F.max("component_size").alias("sz"),
        F.min("component_size").alias("sz_min"),
    )
    bad = per_comp.filter(
        (F.col("n_canon") != 1) | (F.col("n") != F.col("sz")) | (F.col("sz") != F.col("sz_min"))
    ).count()
    assert bad == 0


def test_decontam_only_flags_training_docs(spark, sf_dir):
    df = all_queries()["benchmark_decontam"].fn(spark, sf_dir)
    assert df.filter(F.col("doc_id") % 50 == 0).count() == 0
    # fractions are sane
    assert df.filter((F.col("shared_fraction") <= 0) | (F.col("shared_fraction") > 1)).count() == 0
    assert df.filter(F.col("n_shared_shingles") > F.col("n_shingles")).count() == 0
