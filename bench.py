"""Benchmark runner: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

The LAST stdout line is ONE compact JSON line (kept under ~1.5 kB so the
driver's tail capture can parse it — BENCH_r05/r06 went `parsed: null`
because the full-detail line outgrew the 2000-char tail):
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "steady_total": ..., "tpch_steady_total": ..., "mining_steady_total": ...,
   "retrieval_steady_total": ..., "detail": "<path>"}
`queries` holds per-query STEADY seconds for the headline suite; the other
suites' per-query steady values ride in `tpch_q`/`mining_q`/`retr_q` with
shortened keys. The FULL record (first-run + steady for every suite) is
written to ARTIFACTS/bench_scratch.json (GITIGNORED — committed evidence
names are opt-in via SPARK_GRAFT_BENCH_DETAIL) and referenced by `detail`.

Each query is executed to completion with a cheap count-style sink (collect
for small results) after a warmup of the Spark session + parquet footer
reads. Wall-clock per query is end-to-end including planning.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools")
)

from check_oracle import fixture_scale, max_sf_skip_reason  # noqa: E402

from ai_metadata_lineage_pyspark_spark.functions.cache import (  # noqa: E402
    release_models,
    release_persisted,
)
from ai_metadata_lineage_pyspark_spark.functions.io import load  # noqa: E402
from ai_metadata_lineage_pyspark_spark.registry import all_queries  # noqa: E402
from ai_metadata_lineage_pyspark_spark.session import get_spark  # noqa: E402


# The full 22-query TPC-H-shaped suite in Q order (registry names; see each
# operator's docstring for its Q mapping).
_TPCH_SUITE = [
    (1, "pricing_summary"),
    (2, "min_cost_supplier"),
    (3, "order_shipping_priority"),
    (4, "late_shipment_priority"),
    (5, "local_supplier_volume"),
    (6, "forecast_revenue_change"),
    (7, "nation_trade_volume"),
    (8, "nation_market_share"),
    (9, "product_type_profit"),
    (10, "returned_item_report"),
    (11, "important_part_value"),
    (12, "shipping_delay_priority"),
    (13, "customer_order_distribution"),
    (14, "promo_revenue_share"),
    (15, "top_supplier_revenue"),
    (16, "supplier_part_variety"),
    (17, "small_quantity_avg_revenue"),
    (18, "large_order_customers"),
    (19, "brand_bracket_revenue"),
    (20, "excess_shipped_suppliers"),
    (21, "sole_late_supplier_waits"),
    (22, "idle_rich_customers"),
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # SPARK_GRAFT_BENCH_SUITES=headline[,tpch,...] runs a subset (r10: the
    # sf1 anchor times the headline suite only); default runs everything
    known_suites = {
        "headline", "tpch", "mining", "retrieval",
        "extras", "extras8", "extras9", "extras10",
    }
    suites = set(
        (
            os.environ.get("SPARK_GRAFT_BENCH_SUITES")
            or ",".join(sorted(known_suites))
        ).split(",")
    )
    # a typo'd token would silently run nothing and record zeroed suite
    # totals that read like a timing result (r10 advice) — fail fast instead
    unknown = suites - known_suites
    if unknown:
        raise SystemExit(
            f"bench.py: unknown SPARK_GRAFT_BENCH_SUITES token(s) {sorted(unknown)}; "
            f"known: {sorted(known_suites)}"
        )
    # max_sf contract gate (r11 advice): check_oracle/subset_oracle already
    # refuse to run a demoted ground-truth harness above its contract, but
    # bench.py selected every q.bench query unconditionally — so cosine_topk
    # (bench=True, max_sf=1.0) would have run its quadratic |Q|x|N| baseline
    # ungated in any future sf>1 bench. Same shared gate, same semantics:
    # unknown fixture scale fails CLOSED unless SPARK_GRAFT_BENCH_FORCE=1.
    bench_scale = fixture_scale(sf_dir)
    bench_force = os.environ.get("SPARK_GRAFT_BENCH_FORCE") == "1"

    def max_sf_skip(name: str, q) -> bool:
        reason = max_sf_skip_reason(q, bench_scale, bench_force)
        if reason is not None:
            print(f"# SKIP {name}: {reason}", file=sys.stderr)
            return True
        return False

    spark = get_spark("bench")
    # warm the JVM + parquet footers of every table the headline queries
    # touch, so per-query numbers measure the plan, not session startup or
    # first-read file listing
    for table in (
        "lineitem orders customer nation region events documents embeddings".split()
    ):
        load(spark, sf_dir, table).count()
    # one small untimed pipeline exercising the hot engine paths (shuffle,
    # hash agg, window, broadcast join, higher-order array exprs) so the
    # first timed queries measure their plan, not Spark-internal JIT warmup
    from pyspark.sql import Window  # noqa: PLC0415
    from pyspark.sql import functions as F  # noqa: PLC0415

    warm = (
        load(spark, sf_dir, "orders")
        .limit(10000)
        .join(
            load(spark, sf_dir, "customer").limit(1000),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .withColumn("rn", F.row_number().over(Window.partitionBy("o_custkey").orderBy("o_orderkey")))
        .withColumn("toks", F.expr("split(lower(c_name), '\\\\s+')"))
        .withColumn("nt", F.expr("size(filter(toks, x -> length(x) > 2))"))
        .groupBy("o_orderstatus")
        .agg(F.sum("nt").alias("s"), F.max("rn").alias("m"))
    )
    warm.count()
    # second warm pipeline for the expression-engine paths the text/dedup
    # queries lean on (regexp, md5, conv, array transforms/folds, min-over-
    # window, when-chains): exercises the interpreter + Janino/JIT machinery
    # on a DIFFERENT plan than any timed query, so timed numbers still pay
    # their own plan's codegen but not Spark's first-compile-ever humps
    warm2 = (
        load(spark, sf_dir, "customer")
        .limit(5000)
        .withColumn("lt", F.expr("lower(c_name)"))
        .withColumn("np", F.length(F.regexp_replace(F.col("lt"), r"[a-z\s]", "")))
        .withColumn("fp", F.md5(F.trim(F.regexp_replace(F.col("lt"), r"\s+", " "))))
        .withColumn(
            "bkt",
            F.expr(
                "pmod(cast(conv(substr(md5(cast(c_custkey as string)), 1, 8), 16, 10)"
                " as bigint), 100)"
            ),
        )
        .withColumn("arr", F.expr("transform(sequence(0, 7), j -> j * np)"))
        .withColumn("s", F.expr("aggregate(arr, 0L, (a, x) -> a + x)"))
        .withColumn("u", F.expr("size(array_distinct(split(lt, 'a')))"))
        .withColumn("mn", F.min("c_custkey").over(Window.partitionBy("fp")))
        .withColumn(
            "cls",
            F.when(F.col("np") > 10, "a").when(F.col("u") > 3, "b").otherwise("c"),
        )
        .groupBy("cls")
        .agg(F.sum("s").alias("ss"), F.min("mn").alias("m"), F.count(F.lit(1)).alias("n"))
    )
    warm2.count()
    # third warm pipeline: spin up the Python/Arrow worker pool once so the
    # first timed mapInPandas query (image_meta_extract & co.) measures its
    # plan, not daemon fork + Arrow stream setup (round-2 "regressions" were
    # exactly this: 7.9s cold vs 0.87s warm on the same plan)
    import pandas as pd  # noqa: PLC0415

    def _warm_batches(batches):
        for pdf in batches:
            yield pd.DataFrame({"n": [len(pdf)]})

    load(spark, sf_dir, "documents").limit(256).mapInPandas(
        _warm_batches, schema="n long"
    ).count()

    steady_runs: dict[str, list[float]] = {}

    def timed_pair(fn, label: str) -> tuple[float, float]:
        """(first_run, steady) wall-clock for one query; steady is the
        MEDIAN OF THREE post-warm executions (r9 protocol).

        First run includes this plan's one-time codegen/Janino/JIT compile,
        which is a per-HOST constant (it varies ~2x between sandbox hosts
        and is irrelevant at cluster scale, where compile happens once per
        executor lifetime). Recording both lets a round-over-round
        comparison distinguish a genuine plan regression (steady moves)
        from host JIT variance (only first-run moves). A SINGLE steady
        sample proved noise-bound on this host (r8: back-to-back
        full-suite totals swung 17.8s <-> 21.2s on an identical tree), so
        the committed per-query number is the median of three steady
        executions; all three samples are recorded in the detail artifact
        (`steady_runs`) so the spread itself is auditable. Persisted
        intermediates are released between runs (scoped release, not
        clearCache: clearCache silently clears persist flags on live DFs)
        so successive queries don't compete for executor storage memory —
        and so every steady run re-executes the full pipeline rather than
        reading a cache.
        """
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        first = round(time.time() - t0, 3)
        release_persisted()
        samples = []
        for _ in range(3):
            t0 = time.time()
            fn(spark, sf_dir).count()
            samples.append(round(time.time() - t0, 3))
            release_persisted()
        steady_t = sorted(samples)[1]
        steady_runs[label] = samples
        print(
            f"# {label}: {n} rows in {first}s"
            f" (steady median {steady_t}s of {samples})",
            file=sys.stderr,
        )
        return first, steady_t

    queries = {n: q for n, q in sorted(all_queries().items()) if q.bench}
    timings: dict[str, float] = {}
    steady: dict[str, float] = {}
    if "headline" in suites:
        for name, q in queries.items():
            if max_sf_skip(name, q):
                continue
            timings[name], steady[name] = timed_pair(q.fn, name)

    # TPC-H power run: all 22 suite queries sequentially (single stream),
    # the classic power-test shape. A second self-relative metric so a
    # regression anywhere in the join/agg surface shows up even if the
    # headline set stays fast. First/steady split applies here too —
    # round 5's 22.8s-vs-12.3s "regression" was entirely the host's JIT
    # compile constant on first-run-only numbers.
    registry = all_queries()
    tpch_timings: dict[str, float] = {}
    tpch_steady: dict[str, float] = {}
    if "tpch" in suites:
        for qnum, name in _TPCH_SUITE:
            if max_sf_skip(name, registry[name]):
                continue
            key = f"q{qnum:02d}_{name}"
            tpch_timings[key], tpch_steady[key] = timed_pair(
                registry[name].fn, f"tpch {key}"
            )

    # Mining/curation suite (round-5 additions): timed as a SEPARATE metric
    # so the headline total stays comparable round-over-round against the
    # round-1 anchor (same query set), while the new surface still gets a
    # recorded per-round number.
    mining_suite = [
        "frequent_pair_mining",
        "daily_revenue_anomaly",
        "zorder_layout",
        "weighted_doc_sample",
        "doc_mixture_schedule",
        "kmeans_assign",
        "neardup_canonical_pick",
    ]
    mining_timings: dict[str, float] = {}
    mining_steady: dict[str, float] = {}
    if "mining" in suites:
        for name in mining_suite:
            if max_sf_skip(name, registry[name]):
                continue
            mining_timings[name], mining_steady[name] = timed_pair(
                registry[name].fn, f"mining {name}"
            )

    # Retrieval/profiling suite (round-6 additions): again a separate
    # metric so the headline and mining totals stay comparable to their
    # earlier-round anchors.
    retrieval_suite = [
        "hybrid_search_rrf",
        "bloom_decontam",
        "bloom_decontam_smallm",
        "quantile_bottomk_sketch",
        "lexical_search_topk",
        "lm_bigram_doc_score",
    ]
    retr_timings: dict[str, float] = {}
    retr_steady: dict[str, float] = {}
    if "retrieval" in suites:
        for name in retrieval_suite:
            if max_sf_skip(name, registry[name]):
                continue
            retr_timings[name], retr_steady[name] = timed_pair(
                registry[name].fn, f"retrieval {name}"
            )

    # Round-7 additions, recorded in the FULL artifact only (the compact
    # driver line keeps its fixed four-suite shape for round-over-round
    # comparability).
    extras_suite = [
        "plan_lineage_edges",
        "bpe_train_merges",
        "bpe_apply_encode",
        "token_budget_waterfill",
        "grouped_agg_pandas_udf",
        "sparse_cosine_doc_pairs",
        "duplicate_substring_spans",
        "semdedup_prune",
        "observed_ingest_metrics",
    ]
    extras_timings: dict[str, float] = {}
    extras_steady: dict[str, float] = {}
    if "extras" in suites:
        for name in extras_suite:
            if max_sf_skip(name, registry[name]):
                continue
            extras_timings[name], extras_steady[name] = timed_pair(
                registry[name].fn, f"extras {name}"
            )
    # Fitted-model artifacts (the BPE merge table) are scoped to the suite:
    # bpe_apply_encode's FIRST run prices fit+encode, its steady run prices
    # encode against the fitted model — the production shape — and the
    # model is dropped here so nothing leaks past the suite.
    release_models()

    # round-8 additions: separate anchor suite (full record only — the
    # compact driver line keeps its fixed four-suite shape)
    extras8_suite = [
        "duplicate_span_merge",
        "ngram_novelty_curve",
        "minhash_estimate_error",
        "hard_negative_mining",
        "key_skew_histogram",
        "scd2_user_state_history",
        "embedding_pq_quantize",
        "pq_adc_topk",
        "ivf_pq_topk",
        "ivf_pq_residual_topk",
        "pq_recall_eval",
        "streaming_scd2_history",
        "bm25_search_topk",
        # continuation-session batches (4th-7th): span-dedup w/ reconstruction,
        # best-source dedup, CCNet terciles, vector profiling/normalization,
        # LSH + decontam calibration sweeps, SimHash pairs, funnel census
        "chunk_dedup_reconstruct",
        "source_priority_dedup",
        "lm_quality_buckets",
        "embedding_dim_stats",
        "minhash_band_sweep",
        "curation_funnel_report",
        "token_simpson_diversity",
        "embedding_quantile_normalize",
        "embedding_norm_outliers",
        "langid_confusion_matrix",
        "simhash_hamming_pairs",
        "simhash_hamming_pairs_capped",
        "decontam_ngram_sweep",
        "embedding_power_iteration",
        "ivf_nprobe_sweep",
        "quality_score_rank_correlation",
        "bloom_m_sweep",
        "winsorized_group_stats",
        "streaming_decontam_gate",
        "streaming_vocab_topk",
    ]
    extras8_timings: dict[str, float] = {}
    extras8_steady: dict[str, float] = {}
    if "extras8" in suites:
        for name in extras8_suite:
            if max_sf_skip(name, registry[name]):
                continue
            extras8_timings[name], extras8_steady[name] = timed_pair(
                registry[name].fn, f"extras8 {name}"
            )
    release_models()

    # round-9 additions (full record only)
    extras9_suite = [
        "simhash64_hamming_pairs",
        "bpe_train_merges_incremental",
        "chargram_minhash_pairs",
    ]
    extras9_timings: dict[str, float] = {}
    extras9_steady: dict[str, float] = {}
    if "extras9" in suites:
        for name in extras9_suite:
            if max_sf_skip(name, registry[name]):
                continue
            extras9_timings[name], extras9_steady[name] = timed_pair(
                registry[name].fn, f"extras9 {name}"
            )
    release_models()

    # round-10 additions (full record only)
    extras10_suite = [
        "cosine_topk_panel",
        "bpe_train_merges_batched",
    ]
    extras10_timings: dict[str, float] = {}
    extras10_steady: dict[str, float] = {}
    if "extras10" in suites:
        for name in extras10_suite:
            if max_sf_skip(name, registry[name]):
                continue
            extras10_timings[name], extras10_steady[name] = timed_pair(
                registry[name].fn, f"extras10 {name}"
            )
    release_models()

    total = round(sum(timings.values()), 3)
    full_record = {
        "metric": "headline_query_wall_clock_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_steady": steady,
        "steady_total": round(sum(steady.values()), 3),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "mining_suite": {
            "metric": "mining_curation_suite_total",
            "value": round(sum(mining_timings.values()), 3),
            "unit": "sec",
            "queries": mining_timings,
            "queries_steady": mining_steady,
            "steady_total": round(sum(mining_steady.values()), 3),
        },
        "mining_suite_steady": round(sum(mining_steady.values()), 3),
        "tpch_power_run": {
            "metric": "tpch_22q_single_stream_total",
            "value": round(sum(tpch_timings.values()), 3),
            "unit": "sec",
            "queries": tpch_timings,
            "queries_steady": tpch_steady,
            "steady_total": round(sum(tpch_steady.values()), 3),
        },
        "tpch_power_steady": round(sum(tpch_steady.values()), 3),
        "retrieval_suite": {
            "metric": "retrieval_profiling_suite_total",
            "value": round(sum(retr_timings.values()), 3),
            "unit": "sec",
            "queries": retr_timings,
            "queries_steady": retr_steady,
            "steady_total": round(sum(retr_steady.values()), 3),
        },
        "retrieval_suite_steady": round(sum(retr_steady.values()), 3),
        "extras_suite": {
            "metric": "round7_additions_total",
            "value": round(sum(extras_timings.values()), 3),
            "unit": "sec",
            "queries": extras_timings,
            "queries_steady": extras_steady,
            "steady_total": round(sum(extras_steady.values()), 3),
        },
        "extras8_suite": {
            "metric": "round8_additions_total",
            "value": round(sum(extras8_timings.values()), 3),
            "unit": "sec",
            "queries": extras8_timings,
            "queries_steady": extras8_steady,
            "steady_total": round(sum(extras8_steady.values()), 3),
        },
        "extras9_suite": {
            "metric": "round9_additions_total",
            "value": round(sum(extras9_timings.values()), 3),
            "unit": "sec",
            "queries": extras9_timings,
            "queries_steady": extras9_steady,
            "steady_total": round(sum(extras9_steady.values()), 3),
        },
        "extras10_suite": {
            "metric": "round10_additions_total",
            "value": round(sum(extras10_timings.values()), 3),
            "unit": "sec",
            "queries": extras10_timings,
            "queries_steady": extras10_steady,
            "steady_total": round(sum(extras10_steady.values()), 3),
        },
        # r9 protocol: the three raw steady samples behind every median,
        # keyed by the run label — the audit trail for host-variance claims
        "steady_protocol": "median_of_3",
        "steady_runs": steady_runs,
    }

    # Full detail goes to a GITIGNORED scratch path by default (r11 verdict
    # "what's wrong" #1: the old default wrote ARTIFACTS/r{N}_bench_local.json,
    # so the driver's post-gate rerun clobbered the builder's COMMITTED
    # median-of-3 evidence in the work tree). Committed evidence names are
    # opt-in via SPARK_GRAFT_BENCH_DETAIL=ARTIFACTS/r{N}_bench_local.json.
    repo = os.path.dirname(os.path.abspath(__file__))
    detail_path = os.environ.get("SPARK_GRAFT_BENCH_DETAIL") or os.path.join(
        "ARTIFACTS", "bench_scratch.json"
    )
    try:
        with open(os.path.join(repo, detail_path), "w") as fh:
            json.dump(full_record, fh, indent=1)
    except OSError as exc:  # keep benching even if ARTIFACTS is unwritable
        print(f"# detail write failed: {exc}", file=sys.stderr)
        detail_path = None

    # Compact LAST line for the driver: four suite steady totals always;
    # per-query steady maps included largest-suite-last and dropped (tpch
    # first) if the line would exceed the driver's tail-capture budget.
    compact = {
        "metric": "headline_query_wall_clock_total",
        "value": total,
        "unit": "sec",
        "sf": full_record["sf"],
        "steady_total": full_record["steady_total"],
        "tpch_steady_total": full_record["tpch_power_steady"],
        "mining_steady_total": full_record["mining_suite_steady"],
        "retrieval_steady_total": full_record["retrieval_suite_steady"],
        "detail": detail_path,
        "queries": steady,
        "mining_q": mining_steady,
        "retr_q": retr_steady,
        # q01..q22 short keys: full names are in the detail artifact
        "tpch_q": {k.split("_", 1)[0]: v for k, v in tpch_steady.items()},
    }
    for droppable in ("tpch_q", "retr_q", "mining_q", "queries"):
        if len(json.dumps(compact, separators=(",", ":"))) <= 1400:
            break
        del compact[droppable]
    print(json.dumps(compact, separators=(",", ":")))


if __name__ == "__main__":
    main()
