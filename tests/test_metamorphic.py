"""DataFrame-API metamorphic fuzzing (VERDICT r04 next-step #4).

The SQL-grammar fuzzer (test_differential_fuzz.py) exercises expression
semantics but cannot reach the engine's own operator compositions. This
family perturbs the INPUT in ways that must not change any registered
query's answer and asserts multiset-equality of results:

* row-order permutation of documents.parquet (a distributed table has no
  order — any order-dependent result is a 1000-executor bug);
* file splitting (documents.parquet as a directory of k part-files: the
  multi-split layout every real table has, so partition-count-dependent
  results surface here);
* split + permuted parts combined.

Plus algebraic laws no perturbation can state:

* dedup idempotence — deduping an already-deduped corpus is the identity;
* cap monotonicity — lsh_pairs_capped(cap1) ⊆ lsh_pairs_capped(cap2) ⊆
  minhash_lsh_pairs for cap1 < cap2 (star edges are clique subsets);
* chain invariance — a composed chunk→dedup→sample→profile pipeline gives
  identical results over every perturbed input layout.

tools/metamorphic_sweep.py drives the same machinery over random seeds /
split counts as the extended per-round tier.
"""

from __future__ import annotations

import os
import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from ai_metadata_lineage_pyspark_spark.registry import all_queries

from tests.conftest import SF_DIR

_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# documents-only queries spanning every operator family that consumes the
# corpus: dedup (exact/LSH/components incl. the capped star path), text
# analysis, hygiene, chunking, sampling, search, curation, profiling.
METAMORPHIC_QUERIES = [
    "exact_dedup",
    "minhash_lsh_pairs",
    "neardup_components",
    "neardup_components_star",
    "simhash",
    "text_langid",
    "text_quality_score",
    "doc_chunking",
    "stratified_sample",
    "tfidf_top_terms",
    "corpus_curation",
    "quality_classifier_score",
    "weighted_doc_sample",
    "doc_mixture_schedule",
    "neardup_canonical_pick",
    # r6 additions: the fused ranker and the Bloom probe both consume the
    # documents table and must be invariant to its physical layout
    "hybrid_search_rrf",
    "bloom_decontam_smallm",
    # r8 continuation additions: every one consumes documents and claims
    # engine-exact determinism, so physical layout must not leak into values
    "chunk_dedup_reconstruct",
    "source_priority_dedup",
    "lm_quality_buckets",
    "minhash_band_sweep",
    "curation_funnel_report",
    "token_simpson_diversity",
    "langid_confusion_matrix",
    "simhash_hamming_pairs_capped",
    "decontam_ngram_sweep",
    "bloom_m_sweep",
    "quality_score_rank_correlation",
    "stratified_topk_sample",
    # r11: the salted two-phase per-domain cap consumes documents and claims
    # an engine-exact total-order tiebreak — layout must not leak into it
    "domain_doc_cap",
]


def perturbed_sf_dir(base_sf: str, out_dir: str, mode: str, seed: int = 0) -> str:
    """Build a fixture dir equal to base_sf except documents.parquet is
    physically re-laid-out: 'permute' (one file, shuffled row order),
    'split<k>' (directory of k round-robin part files), 'split_permute<k>'
    (k parts, each internally shuffled). All other tables symlink through.
    """
    os.makedirs(out_dir, exist_ok=True)
    for t in _TABLES:
        src = os.path.join(base_sf, f"{t}.parquet")
        dst = os.path.join(out_dir, f"{t}.parquet")
        if t != "documents" and os.path.exists(src) and not os.path.exists(dst):
            os.symlink(src, dst)
    docs = pq.read_table(os.path.join(base_sf, "documents.parquet"))
    rng = random.Random(seed)
    idx = list(range(docs.num_rows))
    dst = os.path.join(out_dir, "documents.parquet")
    if mode == "permute":
        rng.shuffle(idx)
        pq.write_table(docs.take(pa.array(idx)), dst)
    elif mode.startswith("split_permute"):
        k = int(mode.removeprefix("split_permute"))
        rng.shuffle(idx)
        os.makedirs(dst, exist_ok=True)
        for p in range(k):
            part = docs.take(pa.array(idx[p::k]))
            pq.write_table(part, os.path.join(dst, f"part-{p:05d}.parquet"))
    elif mode.startswith("split"):
        k = int(mode.removeprefix("split"))
        os.makedirs(dst, exist_ok=True)
        for p in range(k):
            part = docs.take(pa.array(idx[p::k]))
            pq.write_table(part, os.path.join(dst, f"part-{p:05d}.parquet"))
    else:
        raise ValueError(mode)
    return out_dir


def canon_rows(df) -> list[tuple]:
    """Order-insensitive, float-tolerant canonical form of a result.

    Floats are rounded to 9 significant digits: partition layout changes
    double-summation order, so the last ulp may legitimately drift; anything
    above that tolerance is a real order-dependence bug.
    """

    def c(v):
        if isinstance(v, float):
            return float(f"{v:.9g}")
        if isinstance(v, list):
            return tuple(c(x) for x in v)
        return v

    return sorted(tuple(c(v) for v in row) for row in df.collect())


def assert_query_invariant(spark, name: str, dirs: list[str]) -> None:
    fn = all_queries()[name].fn
    base = canon_rows(fn(spark, dirs[0]))
    for d in dirs[1:]:
        other = canon_rows(fn(spark, d))
        assert other == base, (
            f"{name}: result depends on input layout ({d} differs; "
            f"{len(base)} vs {len(other)} rows)"
        )


@pytest.fixture(scope="module")
def layout_dirs(tmp_path_factory) -> list[str]:
    root = tmp_path_factory.mktemp("metamorphic")
    return [
        SF_DIR,
        perturbed_sf_dir(SF_DIR, str(root / "permute"), "permute", seed=7),
        perturbed_sf_dir(SF_DIR, str(root / "split4"), "split4", seed=7),
        perturbed_sf_dir(SF_DIR, str(root / "sp3"), "split_permute3", seed=11),
    ]


@pytest.mark.parametrize("name", METAMORPHIC_QUERIES)
def test_layout_invariance(spark, layout_dirs, name):
    assert_query_invariant(spark, name, layout_dirs)


def test_exact_dedup_idempotent(spark, sf_dir, tmp_path):
    """Keeping only canonical docs and re-deduping is the identity: every
    group in the second pass has exactly one member."""
    from ai_metadata_lineage_pyspark_spark.functions.io import load
    from ai_metadata_lineage_pyspark_spark.operators.dedup import exact_dedup

    docs = load(spark, sf_dir, "documents")
    canonical_ids = exact_dedup(spark, sf_dir).select(
        F.col("canonical_doc_id").alias("doc_id")
    )
    deduped = docs.join(canonical_ids, "doc_id")
    out = str(tmp_path / "deduped")
    os.makedirs(out)
    for t in _TABLES:
        src = os.path.join(sf_dir, f"{t}.parquet")
        if t != "documents" and os.path.exists(src):
            os.symlink(src, os.path.join(out, f"{t}.parquet"))
    deduped.write.parquet(os.path.join(out, "documents.parquet"))

    second = exact_dedup(spark, out)
    assert second.filter(F.col("n_copies") != 1).count() == 0
    assert second.count() == deduped.count()


def test_lsh_cap_monotonicity(spark, sf_dir):
    """Star edges are clique subsets, so verified pair sets are monotone in
    the cap: cap=2 ⊆ cap=8 ⊆ uncapped."""
    from ai_metadata_lineage_pyspark_spark.operators.dedup import (
        lsh_pairs_capped,
        minhash_lsh_pairs,
    )

    def pairset(df):
        return {(r["doc_a"], r["doc_b"]) for r in df.select("doc_a", "doc_b").collect()}

    p2 = pairset(lsh_pairs_capped(spark, sf_dir, bucket_cap=2))
    p8 = pairset(lsh_pairs_capped(spark, sf_dir, bucket_cap=8))
    full = pairset(minhash_lsh_pairs(spark, sf_dir))
    assert p2 <= p8 <= full


def test_components_refine_under_capping(spark, sf_dir):
    """Capped components may only SPLIT exact components, never merge
    across them: every capped component is a subset of one exact component."""
    from ai_metadata_lineage_pyspark_spark.registry import all_queries

    qs = all_queries()
    exact = {
        r["doc_id"]: r["component_id"]
        for r in qs["neardup_components"].fn(spark, sf_dir).collect()
    }
    star = {
        r["doc_id"]: r["component_id"]
        for r in qs["neardup_components_star"].fn(spark, sf_dir).collect()
    }
    assert set(star) <= set(exact)  # star may drop docs, never invent them
    # two docs in one star component must share their exact component
    by_star: dict[int, list[int]] = {}
    for doc, c in star.items():
        by_star.setdefault(c, []).append(doc)
    for members in by_star.values():
        assert len({exact[d] for d in members}) == 1


def chain_profile(spark, sf_dir: str):
    """Composed chunk→dedup→sample→profile pipeline used for chain
    invariance: chunk the corpus, exact-dedup the chunks, deterministically
    sample ~half by md5 gate, profile per language."""
    qs = all_queries()
    chunks = qs["doc_chunking"].fn(spark, sf_dir)
    deduped = (
        chunks.groupBy(F.col("chunk_hash").alias("h"))
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count(F.lit(1)).alias("copies"),
            F.min("chunk_len").alias("n_chars"),
        )
    )
    sampled = deduped.filter(
        F.conv(F.substring(F.md5(F.concat_ws("|", "h", "doc_id")), 1, 4), 16, 10)
        .cast("long") % 2 == 0
    )
    return sampled.groupBy((F.col("doc_id") % 10).alias("doc_band")).agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("copies").alias("n_raw"),
        F.sum("n_chars").alias("total_chars"),
        F.min("h").alias("min_hash"),
    )


def test_chain_invariance_across_layouts(spark, layout_dirs):
    base = canon_rows(chain_profile(spark, layout_dirs[0]))
    assert len(base) > 0
    for d in layout_dirs[1:]:
        assert canon_rows(chain_profile(spark, d)) == base
