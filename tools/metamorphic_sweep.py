"""Extended metamorphic sweep: the same layout-invariance machinery as
tests/test_metamorphic.py driven over many random layouts — random
permutation seeds and random part-file counts — so the per-round tier can
push operator-composition invariance well past the two layouts CI checks.

Usage: python tools/metamorphic_sweep.py [n_layouts] [first_seed] [sf_dir]
Prints per-layout progress and a final summary; exits 1 on any divergence.
"""

from __future__ import annotations

import random
import sys
import tempfile
import time

sys.path.insert(0, ".")

from ai_metadata_lineage_pyspark_spark.session import get_spark  # noqa: E402
from tests.test_metamorphic import (  # noqa: E402
    METAMORPHIC_QUERIES,
    canon_rows,
    chain_profile,
    perturbed_sf_dir,
)
from ai_metadata_lineage_pyspark_spark.registry import all_queries  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10
FIRST = int(sys.argv[2]) if len(sys.argv) > 2 else 100
SF = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.001"


def main() -> int:
    spark = get_spark("metamorphic-sweep", shuffle_partitions=8)
    qs = all_queries()
    t0 = time.time()
    base = {n: canon_rows(qs[n].fn(spark, SF)) for n in METAMORPHIC_QUERIES}
    base["__chain__"] = canon_rows(chain_profile(spark, SF))
    print(f"# baseline over {SF}: {len(base)} queries in {time.time() - t0:.0f}s",
          flush=True)

    failures: list[tuple[int, str]] = []
    with tempfile.TemporaryDirectory() as root:
        for i, seed in enumerate(range(FIRST, FIRST + N)):
            rng = random.Random(seed)
            mode = rng.choice(
                ["permute", f"split{rng.randint(2, 8)}",
                 f"split_permute{rng.randint(2, 8)}"]
            )
            d = perturbed_sf_dir(SF, f"{root}/layout_{seed}", mode, seed=seed)
            for n in METAMORPHIC_QUERIES:
                got = canon_rows(qs[n].fn(spark, d))
                if got != base[n]:
                    failures.append((seed, n))
                    print(f"DIVERGENCE seed={seed} mode={mode} query={n}:"
                          f" {len(base[n])} vs {len(got)} rows", flush=True)
            got = canon_rows(chain_profile(spark, d))
            if got != base["__chain__"]:
                failures.append((seed, "__chain__"))
                print(f"DIVERGENCE seed={seed} mode={mode} query=__chain__",
                      flush=True)
            print(f"# layout {i + 1}/{N} (seed={seed}, {mode}) ok,"
                  f" {time.time() - t0:.0f}s", flush=True)

    status = "ALL INVARIANT" if not failures else f"{len(failures)} DIVERGENCES"
    print(f"{status}: {N} layouts x {len(METAMORPHIC_QUERIES) + 1} pipelines"
          f" (seeds {FIRST}..{FIRST + N - 1}) in {time.time() - t0:.0f}s")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
