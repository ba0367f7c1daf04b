"""Unit + plan tests for the round-5 mining/sampling/clustering additions
(`frequent_pair_mining`, `daily_revenue_anomaly`, `zorder_layout`,
`weighted_doc_sample`, `doc_mixture_schedule`, `kmeans_assign`,
`neardup_canonical_pick`). Hash-parity vs DuckDB is covered by the oracle
gate; these pin the semantic invariants and the physical-plan shapes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ai_metadata_lineage_pyspark_spark.plans import inspect as I
from ai_metadata_lineage_pyspark_spark.registry import all_queries


@pytest.fixture(scope="module")
def q(spark, sf_dir):
    qs = all_queries()

    def build(name):
        return qs[name].fn(spark, sf_dir)

    return build


# --- frequent_pair_mining ---------------------------------------------------


def test_pair_mining_pairs_are_ordered_and_supported(q):
    rows = q("frequent_pair_mining").collect()
    assert rows, "expected at least one frequent pair"
    for r in rows:
        assert r.part_a < r.part_b
        assert r.support >= 2
    supports = [r.support for r in rows]
    assert supports == sorted(supports, reverse=True)


def test_pair_mining_plan_has_no_join(q):
    # the basket-array shape must not contain any join operator: pair
    # expansion is a map-side array expression, not an items self-join
    df = q("frequent_pair_mining")
    plan = I.physical_plan(df)
    assert "Join" not in plan
    assert I.partial_aggregate_count(df) >= 2  # basket build + pair count


# --- daily_revenue_anomaly --------------------------------------------------


def test_anomaly_zscore_is_bounded_and_flags_match(q):
    rows = q("daily_revenue_anomaly").collect()
    assert rows
    for r in rows:
        if r.zscore is not None:
            # |z| of one element within a 7-sample window is bounded by
            # (n-1)/sqrt(n) = 6/sqrt(7) ≈ 2.2678
            assert abs(r.zscore) <= 2.268
            assert r.is_spike == (r.zscore > 2.0)
        else:
            assert r.is_spike is False


def test_anomaly_aggregates_before_window(q):
    # the window input must be the per-day rollup (partial agg present);
    # the ordered window over the day series is the post-shuffle stage
    df = q("daily_revenue_anomaly")
    assert I.partial_aggregate_count(df) >= 1
    assert "Window" in I.physical_plan(df)


# --- zorder_layout ----------------------------------------------------------


def test_zorder_buckets_partition_the_table(q, spark, sf_dir):
    from ai_metadata_lineage_pyspark_spark.functions.io import load

    rows = q("zorder_layout").collect()
    n_orders = load(spark, sf_dir, "orders").count()
    assert sum(r.n_orders for r in rows) == n_orders
    assert len(rows) >= 2, "bucket shift should yield multiple buckets"
    # clustering quality: every bucket's bounding box must be far smaller
    # than the full 2-D domain (the whole point of the Z-layout)
    full_area = (
        (max(r.max_cust for r in rows) - min(r.min_cust for r in rows) + 1)
        * (max(r.max_day for r in rows) - min(r.min_day for r in rows) + 1)
    )
    for r in rows:
        assert r.bbox_area <= full_area / 2


def test_zorder_plan_is_pure_codegen(q):
    df = q("zorder_layout")
    plan = I.physical_plan(df)
    assert "Join" not in plan
    assert "python" not in plan.lower()  # 32 shift-mask terms, no UDF
    assert I.shuffle_exchange_count(df) == 1  # only the 64-row rollup


# --- weighted_doc_sample / doc_mixture_schedule -----------------------------


def test_weighted_sample_tracks_expected_rate(q):
    rows = q("weighted_doc_sample").collect()
    assert rows
    total = sum(r.n_total for r in rows)
    sampled = sum(r.n_sampled for r in rows)
    expected = sum(r.expected_pct_sum for r in rows) / 100.0
    assert 0 < sampled < total
    # md5 gate is uniform: realized sample within ±30% of the exact
    # expected mass (loose: fixture is small)
    assert abs(sampled - expected) <= 0.3 * expected


def test_mixture_rates_anneal_upward(q):
    rows = q("doc_mixture_schedule").collect()
    by_source = {}
    for r in rows:
        by_source.setdefault(r.source, {})[r.epoch] = r
    for source, per_epoch in by_source.items():
        assert set(per_epoch) == {1, 2, 3}
        rates = [per_epoch[e].rate for e in (1, 2, 3)]
        assert rates == sorted(rates), f"{source} rates must be non-decreasing"
        assert all(r <= 100 for r in rates)
        # independent per-epoch samples: n_sampled tracks rate direction
        # in expectation; pin only the hard invariant n_sampled <= n_docs
        for e in (1, 2, 3):
            assert per_epoch[e].n_sampled <= per_epoch[e].n_docs


def test_mixture_epoch_samples_are_independent(spark, sf_dir):
    # epoch gates hash (doc_id, epoch): epoch-2 selection must not be a
    # subset/superset of epoch-1 at equal rates — check the bucket exprs
    # differ per epoch on a fixed doc
    from ai_metadata_lineage_pyspark_spark.operators.sampling import (
        _EPOCH_BUCKET_SPARK,
    )

    df = spark.range(100).select(
        F.col("id").alias("doc_id"), F.lit(1).alias("epoch")
    ).select(F.expr(_EPOCH_BUCKET_SPARK).alias("b1"))
    df2 = spark.range(100).select(
        F.col("id").alias("doc_id"), F.lit(2).alias("epoch")
    ).select(F.expr(_EPOCH_BUCKET_SPARK).alias("b2"))
    b1 = [r.b1 for r in df.collect()]
    b2 = [r.b2 for r in df2.collect()]
    assert b1 != b2


# --- kmeans_assign ----------------------------------------------------------


def test_kmeans_covers_corpus_and_centroids_self_assign(q, spark, sf_dir):
    from ai_metadata_lineage_pyspark_spark.functions.io import load

    rows = q("kmeans_assign").collect()
    n_vecs = load(spark, sf_dir, "embeddings").count()
    assert sum(r.n_points for r in rows) == n_vecs
    # every centroid's own vector has cosine 1.0 with itself, so each of
    # the K clusters is non-empty and contains its centroid id
    assert len(rows) == 8
    for r in rows:
        assert r.min_member <= r.cent_id
        assert -1.0 <= r.avg_cos <= 1.0


def test_kmeans_centroids_are_broadcast(q):
    # the K-row centroid side must broadcast (BroadcastNestedLoopJoin
    # BuildRight for a cross join), never a CartesianProduct shuffle
    df = q("kmeans_assign")
    plan = I.physical_plan(df)
    assert "BroadcastNestedLoopJoin BuildRight" in plan
    assert I.cartesian_product_count(df) == 0
    # and the per-vector argmax must use the WindowGroupLimit top-1 path
    assert "WindowGroupLimit" in plan


# --- neardup_canonical_pick -------------------------------------------------


def test_canonical_pick_chooses_longest_member(q, spark, sf_dir):
    comps = q("neardup_components")
    picks = {r.component_id: r for r in q("neardup_canonical_pick").collect()}
    from ai_metadata_lineage_pyspark_spark.functions.io import load

    docs = {r.doc_id: r.n_chars for r in load(spark, sf_dir, "documents").collect()}
    members: dict[int, list[int]] = {}
    for r in comps.collect():
        members.setdefault(r.component_id, []).append(r.doc_id)
    assert set(picks) == set(members)
    for cid, docs_in in members.items():
        p = picks[cid]
        assert p.component_size == len(docs_in)
        best = sorted(docs_in, key=lambda d: (-docs[d], d))[0]
        assert p.canonical_doc == best
        assert p.canonical_chars == docs[best]
        assert p.total_chars == sum(docs[d] for d in docs_in)


# --- lm_bigram_doc_score ----------------------------------------------------


def test_lm_score_covers_all_multiword_docs(q, spark, sf_dir):
    from ai_metadata_lineage_pyspark_spark.functions.io import load

    rows = q("lm_bigram_doc_score").collect()
    n_docs = (
        load(spark, sf_dir, "documents")
        .where("size(split(lower(text), '\\\\s+')) >= 2")
        .count()
    )
    assert len(rows) == n_docs
    for r in rows:
        assert r.n_bigrams >= 1
        assert r.avg_bigram_count >= 1  # every bigram occurs at least once
        assert r.is_unusual == (r.avg_bigram_count < 5)


# --- embedding_quantize_int8 ------------------------------------------------


def test_quantize_census_is_sane(q, spark, sf_dir):
    from ai_metadata_lineage_pyspark_spark.functions.io import load

    rows = q("embedding_quantize_int8").collect()
    n_vecs = load(spark, sf_dir, "embeddings").count()
    assert sum(r.n_vecs for r in rows) == n_vecs
    dim = 64
    for r in rows:
        # max element of every vector quantizes to exactly +/-127
        assert r.max_abs_quant == 127
        # rounding error is < 0.5 ulp per element -> < 0.5e6 micro-units
        assert r.total_err_micro < r.n_vecs * dim * 500_000


def test_quantize_plan_is_shuffle_minimal(q):
    from ai_metadata_lineage_pyspark_spark.plans import inspect as I

    df = q("embedding_quantize_int8")
    assert I.shuffle_exchange_count(df) == 1  # only the label rollup
    assert "Join" not in I.physical_plan(df)


# --- ann_recall_eval / kmeans_iterate ---------------------------------------


def test_ann_recall_is_complete_and_bounded(q):
    rows = q("ann_recall_eval").collect()
    exact_queries = {r.query_id for r in q("cosine_topk").collect()}
    assert {r.query_id for r in rows} == exact_queries
    for r in rows:
        assert r.n_exact == 10
        assert 0 <= r.n_hits <= r.n_exact
        assert r.recall_pct == r.n_hits * 100 // r.n_exact


def test_kmeans_iterate_improves_objective(q, spark, sf_dir):
    from ai_metadata_lineage_pyspark_spark.functions.io import load

    step1 = q("kmeans_assign").collect()
    step2 = q("kmeans_iterate").collect()
    n_vecs = load(spark, sf_dir, "embeddings").count()
    assert sum(r.n_points for r in step2) == n_vecs
    # Lloyd monotonicity: moving centroids to their members' mean cannot
    # decrease the total assignment similarity (allow tiny slack for the
    # integer micro-quantization of the updated centroids)
    obj1 = sum(r.sum_cos_micro for r in step1)
    obj2 = sum(r.sum_cos_micro for r in step2)
    assert obj2 >= obj1 - n_vecs  # <= 1 micro-unit slack per point


# --- incremental_corpus_dedup -----------------------------------------------


def test_incremental_dedup_admission_record(q, spark, sf_dir):
    from ai_metadata_lineage_pyspark_spark.functions.io import load

    rows = {r.doc_id: r for r in q("incremental_corpus_dedup").collect()}
    docs = load(spark, sf_dir, "documents").collect()
    incoming = [d for d in docs if d.doc_id % 5 == 0]
    assert set(rows) == {d.doc_id for d in incoming}
    for r in rows.values():
        assert r.is_new == (r.n_exact_dups == 0 and r.n_near_dups == 0)
    # cross-check exact matches against a driver-side recomputation
    import re

    def norm(t):
        return re.sub(r"\s+", " ", t.lower()).strip()

    existing_norms = {}
    for d in docs:
        if d.doc_id % 5 != 0:
            existing_norms.setdefault(norm(d.text), 0)
            existing_norms[norm(d.text)] += 1
    for d in incoming:
        assert rows[d.doc_id].n_exact_dups == existing_norms.get(norm(d.text), 0)


# --- bpe_merge_candidates ---------------------------------------------------


def test_bpe_candidates_are_ranked_and_consistent(q):
    rows = q("bpe_merge_candidates").collect()
    assert len(rows) == 25
    occs = [r.n_occurrences for r in rows]
    assert occs == sorted(occs, reverse=True)
    for r in rows:
        assert len(r.pair) == 2
        # a pair cannot occur in fewer distinct words than once, nor occur
        # fewer times than the words containing it
        assert 1 <= r.n_distinct_words <= r.n_occurrences


# --- perceptron_quality_step ------------------------------------------------


def test_perceptron_epochs_update_consistently(q, spark, sf_dir):
    from ai_metadata_lineage_pyspark_spark.functions.io import load

    rows = {r.step: r for r in q("perceptron_quality_step").collect()}
    assert set(rows) == {1, 2}
    n_docs = load(spark, sf_dir, "documents").count()
    # w0 = 0 misclassifies everything (y*0 <= 0), so epoch 1 updates on
    # every doc and its weights are the full class-weighted feature sums
    assert rows[1].n_updates == n_docs
    # epoch 2 can only update on a subset
    assert 0 <= rows[2].n_updates <= n_docs
    # weights stay integral and epoch-2 weights differ from epoch-1 iff
    # any update happened
    if rows[2].n_updates == 0:
        assert (rows[2].w_len, rows[2].w_bias) == (rows[1].w_len, rows[1].w_bias)


# --- lexical_search_topk / event_transition_matrix --------------------------


def test_lexical_search_ranks_are_dense_per_query(q):
    rows = q("lexical_search_topk").collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2}
    for qid, rs in by_q.items():
        ranks = sorted(r.rank for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        for r in rs:
            assert 1 <= r.n_matched_terms <= 3
            assert r.score > 0


def test_transition_matrix_probabilities_normalize(q):
    rows = q("event_transition_matrix").collect()
    assert rows
    by_prev = {}
    for r in rows:
        by_prev.setdefault(r.prev_type, []).append(r)
    for prev, rs in by_prev.items():
        total_n = sum(r.n for r in rs)
        for r in rs:
            assert r.prob_ppm == r.n * 1_000_000 // total_n
        # integer-floor ppm sums to <= 1e6 and within |rs| of it
        s = sum(r.prob_ppm for r in rs)
        assert 1_000_000 - len(rs) < s <= 1_000_000


# --- customer_ltv_cohorts ---------------------------------------------------


def test_ltv_cohort_triangle_shape(q, spark, sf_dir):
    from ai_metadata_lineage_pyspark_spark.functions.io import load

    rows = q("customer_ltv_cohorts").collect()
    n_orders = load(spark, sf_dir, "orders").count()
    assert sum(r.n_orders for r in rows) == n_orders
    for r in rows:
        assert r.q_since >= 0
        assert r.revenue_usd > 0
    # every cohort has a q_since = 0 cell (the acquisition quarter itself)
    cohorts = {r.cohort_q for r in rows}
    zero_cells = {r.cohort_q for r in rows if r.q_since == 0}
    assert zero_cells == cohorts


# --- streaming_transition_counts --------------------------------------------


def test_transition_state_spans_batch_boundaries():
    # drive the stateful fn directly with two batches split mid-stream for
    # one user: the (batch1-tail -> batch2-head) transition must be counted
    # exactly once, via state, never dropped or double-counted
    import pandas as pd

    from ai_metadata_lineage_pyspark_spark.streaming.sessions import _transition_fn

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    state = FakeState()
    b1 = pd.DataFrame(
        {"ts_us": [1, 2], "event_id": [10, 11], "event_type": ["view", "click"]}
    )
    b2 = pd.DataFrame(
        {"ts_us": [3], "event_id": [12], "event_type": ["purchase"]}
    )
    out1 = list(_transition_fn((7,), iter([b1]), state))[0]
    out2 = list(_transition_fn((7,), iter([b2]), state))[0]
    got = {}
    for out in (out1, out2):
        for r in out.itertuples():
            got[(r.prev_type, r.next_type)] = got.get((r.prev_type, r.next_type), 0) + r.n
    assert got == {("view", "click"): 1, ("click", "purchase"): 1}
    assert state.get[2] == "purchase"


def test_transition_state_out_of_order_batch():
    # a batch whose events are EARLIER than the stored tail must be counted
    # in true (ts_us, event_id) order: the late event precedes the tail (so
    # we count late->tail), and the tail survives as the global max instead
    # of being overwritten by the batch's max
    import pandas as pd

    from ai_metadata_lineage_pyspark_spark.streaming.sessions import _transition_fn

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    state = FakeState()
    b1 = pd.DataFrame(
        {"ts_us": [1, 5], "event_id": [10, 11], "event_type": ["view", "purchase"]}
    )
    # late arrival: ts 3 sits BETWEEN the two already-processed events
    b2 = pd.DataFrame({"ts_us": [3], "event_id": [12], "event_type": ["click"]})
    out1 = list(_transition_fn((7,), iter([b1]), state))[0]
    out2 = list(_transition_fn((7,), iter([b2]), state))[0]
    got = {}
    for out in (out1, out2):
        for r in out.itertuples():
            got[(r.prev_type, r.next_type)] = got.get((r.prev_type, r.next_type), 0) + r.n
    # batch 2 contributes click->purchase (true order), NOT purchase->click
    assert got == {("view", "purchase"): 1, ("click", "purchase"): 1}
    # tail stays the global max (ts 5), not the late batch's max (ts 3)
    assert state.get == (5, 11, "purchase")


def test_streaming_transitions_match_batch_twin(q):
    batch = {(r.prev_type, r.next_type): (r.n, r.prob_ppm)
             for r in q("event_transition_matrix").collect()}
    stream = {(r.prev_type, r.next_type): (r.n, r.prob_ppm)
              for r in q("streaming_transition_counts").collect()}
    assert batch == stream


# --- kmv_key_overlap --------------------------------------------------------


def test_kmv_overlap_estimates_track_exact(q):
    [r] = q("kmv_key_overlap").collect()
    # every orders customer exists in customer: overlap == |A|
    assert r.exact_overlap == r.exact_a
    assert r.exact_a <= r.exact_b
    # KMV with k=64 has relative error ~1/sqrt(k-1) ≈ 13%; allow 3 sigma
    for est, exact in ((r.est_a, r.exact_a), (r.est_b, r.exact_b)):
        assert abs(est - exact) <= max(8, 0.4 * exact)
    # inclusion-exclusion overlap estimate stays in a sane band
    assert r.est_overlap <= r.est_union + 1


# --- plan shapes for the retrieval / cohort additions ------------------------


def test_lexical_search_query_side_broadcasts(q):
    df = q("lexical_search_topk")
    plan = I.physical_plan(df)
    # query terms must broadcast into the postings probe; the per-query
    # top-k must pre-prune via WindowGroupLimit
    assert "BroadcastHashJoin" in plan
    assert "WindowGroupLimit" in plan
    assert I.cartesian_product_count(df) == 0


def test_ltv_cohort_join_is_copartitioned(q):
    # the orders ⋈ first-order join keys on o_custkey on both sides: the
    # plan must be a keyed join (sort-merge or shuffled-hash), never a
    # nested loop, and both aggregations must partial-combine
    df = q("customer_ltv_cohorts")
    plan = I.physical_plan(df)
    assert "NestedLoop" not in plan
    assert I.partial_aggregate_count(df) >= 2


def test_incremental_dedup_never_cartesian(q):
    df = q("incremental_corpus_dedup")
    assert I.cartesian_product_count(df) == 0
    assert "NestedLoop" not in I.physical_plan(df)


# --- graph_triangle_count / revenue_trend_fit -------------------------------


def test_triangle_count_matches_bruteforce(q):
    # recompute triangles driver-side from the same thresholded edge set
    pairs = q("frequent_pair_mining")  # top-k slice of the same graph
    [row] = q("graph_triangle_count").collect()
    assert row.n_edges > 0 and row.n_triangles >= 0
    # structural invariant: triangles require at least 3 edges
    if row.n_triangles > 0:
        assert row.n_edges >= 3
        assert row.min_vertex is not None


def test_trend_fit_reproduces_numpy_ols(q, spark, sf_dir):
    import numpy as np

    from ai_metadata_lineage_pyspark_spark.functions.io import load

    [r] = q("revenue_trend_fit").collect()
    daily = (
        load(spark, sf_dir, "orders")
        .selectExpr(
            "datediff(CAST(o_orderdate AS DATE), DATE '1995-01-01') AS x",
            "CAST(floor(o_totalprice) AS BIGINT) AS y",
        )
        .groupBy("x")
        .sum("y")
        .collect()
    )
    xs = np.array([d[0] for d in daily], dtype=float)
    ys = np.array([d[1] for d in daily], dtype=float)
    slope, intercept = np.polyfit(xs, ys, 1)
    assert abs(r.slope_usd_per_day - slope) < 1e-4 * max(1.0, abs(slope))
    assert abs(r.intercept_usd - intercept) < 1e-4 * max(1.0, abs(intercept))
    assert r.n == len(daily)
