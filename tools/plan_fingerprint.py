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

Usage:
  python tools/plan_fingerprint.py --write [sf_dir]          # refresh ledger
  python tools/plan_fingerprint.py --check [sf_dir] [names]  # diff vs ledger
Default sf_dir is /root/testdata/sf0.001 (the ledger's pinned fixture);
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

LEDGER = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "ARTIFACTS",
    "plan_fingerprints_sf0.001.json",
)


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

    if write:
        with open(LEDGER, "w") as fh:
            json.dump(
                {"sf_dir": sf_dir, "shuffle_partitions": 32, "queries": current},
                fh,
                indent=1,
                sort_keys=True,
            )
        print(f"wrote {len(current)} fingerprints -> {LEDGER}")
        return 0

    # --check (default): diff against the committed ledger
    with open(LEDGER) as fh:
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
