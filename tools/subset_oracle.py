"""Order-randomized driver-subset insurance (VERDICT r05 next-step #6).

The external driver samples ~50 of the registry's queries in ITS own order
with a fresh session; the builder's full sweeps always run alphabetically.
Alphabetical full-sweep ordering could mask cross-query state bleed —
scoped persists or memos surviving into the wrong query, session confs set
by one operator and read by another — because every query always sees the
same predecessors. This tool replays the driver's shape: sample a random
subset, shuffle the execution order, run each query against its DuckDB
oracle in THIS fresh process/session, and fail loudly on any mismatch.

Usage:  python tools/subset_oracle.py [seed] [k] [sf_dir]
Defaults: seed from OS entropy, k=40, sf_dir=/root/testdata/sf0.01.

Each run prints its seed so a failing order is reproducible; commit ≥3
green logs per round to ARTIFACTS.
"""

from __future__ import annotations

import random
import sys
import time

import duckdb

sys.path.insert(0, ".")

from check_oracle import TABLES, fixture_scale, max_sf_skip_reason, table_hash  # noqa: E402

from ai_metadata_lineage_pyspark_spark.registry import all_queries  # noqa: E402
from ai_metadata_lineage_pyspark_spark.session import get_spark  # noqa: E402


def main() -> int:
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else random.SystemRandom().randrange(10**9)
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
    rng = random.Random(seed)
    names = sorted(all_queries())
    subset = rng.sample(names, min(k, len(names)))
    rng.shuffle(subset)
    print(f"# subset_oracle seed={seed} k={len(subset)} sf_dir={sf_dir}")
    print(f"# order: {', '.join(subset)}")

    spark = get_spark("subset-oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    queries = all_queries()
    scale = fixture_scale(sf_dir)
    failures = []
    for name in subset:
        q = queries[name]
        skip = max_sf_skip_reason(q, scale)
        if skip is not None:
            print(f"SKIP {name}: {skip}")
            continue
        t0 = time.time()
        try:
            sdf = q.fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            continue
        if q.oracle is None:
            # rows-only entries have no value oracle; an empty result is a
            # WARNING, not a failure — some registered operators (anomaly /
            # spike-style filters) can legitimately return zero rows at
            # small scale factors, and the error-bound assertions for the
            # two approx rows live in tests/test_approx.py (r6 advice)
            status = "ok? " if srows else "WARN"
            print(f"{status} {name}: rows-only, {len(srows)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(q.oracle)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {e}")
            continue
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"columns spark={sorted(scols)} oracle={sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(drows)}")
        if not problems and table_hash(scols, srows) != table_hash(dcols, drows):
            problems.append("value-hash mismatch")
        if problems:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(f"PASS {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
    print(f"\nseed={seed}: {'ALL GREEN' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
