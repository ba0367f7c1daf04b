"""Persisted intermediates must be releasable: after running the persisting
queries and calling release_persisted(), no cached RDD blocks remain.

Round-1 review finding: minhash_lsh_pairs, ngram_jaccard_pairs and
ann_lsh_topk persisted without unpersist, so a long-lived session invoking
many queries accumulated MEMORY_AND_DISK blocks unboundedly.
"""

from __future__ import annotations

from ai_metadata_lineage_pyspark_spark.functions.cache import release_persisted
from ai_metadata_lineage_pyspark_spark.registry import all_queries

_PERSISTING = ["minhash_lsh_pairs", "ngram_jaccard_pairs", "ann_lsh_topk"]


def _n_cached(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def test_no_cached_rdds_after_release(spark, sf_dir):
    # baseline-relative: localCheckpoint blocks from earlier tests (graph
    # BFS) also count as persistent RDDs and are not ours to release
    release_persisted()
    baseline = _n_cached(spark)
    queries = all_queries()
    for name in _PERSISTING:
        df = queries[name].fn(spark, sf_dir)
        assert df.count() >= 0
        # each persisting query releases its predecessor's caches on entry,
        # so concurrent accumulation is bounded by one query's intermediates
        assert _n_cached(spark) <= baseline + 2
    release_persisted()
    # <= not ==: the async ContextCleaner may concurrently drop out-of-scope
    # localCheckpoint blocks from earlier tests, legitimately lowering the
    # count below the baseline; a leak can only push it ABOVE
    assert _n_cached(spark) <= baseline


def test_release_is_idempotent(spark):
    before = _n_cached(spark)
    release_persisted()
    release_persisted()
    assert _n_cached(spark) <= before
