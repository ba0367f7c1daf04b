"""Fold-vs-unrolled A/B for the broadcast cross-join cosine scorers
(r13 verdict #3 / r14 task): the r13 codegen unroll targeted the PAIR-JOIN
shape (a CodegenFallback higher-order cosine inside a join condition drops
the whole predicate out of whole-stage codegen), but it was also applied to
the K-way broadcast cross-join scorers — where the cosine is a projection,
not a join condition, and the 64-term generated expression could plausibly
cost more than the fold's tight interpreted loop (or less; never measured).
kmeans_assign (2.23x) and ivf_topk (1.94x) were r13's biggest unadjudicated
bench movers, so this tool measures exactly that swap.

Method: for each target query, the registered plan (unrolled) and a
fold-variant plan are each run once warm + N_TIMED timed (median reported),
at each fixture given on the CLI. The fold variant is produced by rebinding
the two helper names the scorers resolve at call/plan-build time:
  * operators.similarity.cosine_from_norms_unrolled_expr -> fold version
  * functions.vectors.cosine_unrolled_expr -> fold version (_km_cos does a
    function-local import, so patching the vectors module covers it)
Both variants are value-identical by the bit-identity property
(tests/test_expr_properties.py), so this is a pure plan-cost A/B.

Usage: python tools/unroll_ab.py [sf_dir ...]   (default sf0.1 + /tmp sf1)
Output: one JSON line per (query, fixture) with both medians; a summary
line naming the winner per shape.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ai_metadata_lineage_pyspark_spark.functions import vectors  # noqa: E402
from ai_metadata_lineage_pyspark_spark.functions.cache import (  # noqa: E402
    release_models,
    release_persisted,
)
from ai_metadata_lineage_pyspark_spark.operators import similarity  # noqa: E402
from ai_metadata_lineage_pyspark_spark.registry import all_queries  # noqa: E402
from ai_metadata_lineage_pyspark_spark.session import get_spark  # noqa: E402

QUERIES = ["kmeans_assign", "kmeans_iterate", "ivf_topk", "cosine_topk_panel"]
N_TIMED = 3

_UNROLLED = {
    "cosine_from_norms": vectors.cosine_from_norms_unrolled_expr,
    "cosine": vectors.cosine_unrolled_expr,
}
_FOLD = {
    "cosine_from_norms": vectors.cosine_from_norms_expr,
    "cosine": vectors.cosine_expr,
}


def _bind(variant: dict) -> None:
    similarity.cosine_from_norms_unrolled_expr = variant["cosine_from_norms"]
    vectors.cosine_unrolled_expr = variant["cosine"]
    vectors.cosine_from_norms_unrolled_expr = variant["cosine_from_norms"]


def _run_once(spark, fn, sf_dir: str) -> float:
    release_persisted()
    release_models()
    t0 = time.time()
    fn(spark, sf_dir).collect()
    return time.time() - t0


def main() -> None:
    fixtures = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/testdata_sf1"]
    spark = get_spark("unroll-ab")
    qs = all_queries()
    results = []
    for sf_dir in fixtures:
        for name in QUERIES:
            fn = qs[name].fn
            rec = {"query": name, "fixture": sf_dir}
            for label, variant in (("unrolled", _UNROLLED), ("fold", _FOLD)):
                _bind(variant)
                _run_once(spark, fn, sf_dir)  # warm
                walls = [_run_once(spark, fn, sf_dir) for _ in range(N_TIMED)]
                rec[label] = round(statistics.median(walls), 3)
                rec[f"{label}_runs"] = [round(w, 3) for w in walls]
            rec["winner"] = "fold" if rec["fold"] < rec["unrolled"] else "unrolled"
            rec["ratio_fold_over_unrolled"] = round(rec["fold"] / rec["unrolled"], 3)
            results.append(rec)
            print(json.dumps(rec), flush=True)
    _bind(_UNROLLED)  # restore
    by_q: dict[str, list] = {}
    for r in results:
        by_q.setdefault(r["query"], []).append(r)
    summary = {
        q: (
            "fold"
            if all(r["winner"] == "fold" for r in rs)
            else "unrolled"
            if all(r["winner"] == "unrolled" for r in rs)
            else "mixed"
        )
        for q, rs in by_q.items()
    }
    print(json.dumps({"summary": summary}), flush=True)


if __name__ == "__main__":
    main()
