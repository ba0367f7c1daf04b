"""Extended differential-fuzz sweep: the same generator as
tests/test_differential_fuzz.py driven over many more seeds than CI runs —
used per-round to push the Spark-vs-DuckDB comparison deep into the grammar
space and record the result as an artifact.

Usage: python tools/fuzz_sweep.py [n_cases] [first_seed]
Prints progress and a final summary line; exits 1 on any divergence.
"""

from __future__ import annotations

import sys
import time

import duckdb
import pyarrow as pa

sys.path.insert(0, ".")

from ai_metadata_lineage_pyspark_spark.session import get_spark  # noqa: E402
from tests.test_differential_fuzz import (  # noqa: E402
    N_TABLES,
    T_ARROW,
    T_DDL,
    _gen_t,
    _gen_u,
    _run_both,
    _sql_for_case,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
FIRST = int(sys.argv[2]) if len(sys.argv) > 2 else 1000


def main() -> int:
    spark = get_spark("fuzz-sweep", shuffle_partitions=4)
    con = duckdb.connect()
    for k in range(N_TABLES):
        trows, urows = _gen_t(k), _gen_u(k)
        spark.createDataFrame(trows, schema=T_DDL).createOrReplaceTempView(f"fz_t{k}")
        spark.createDataFrame(urows, schema="k long, v long").createOrReplaceTempView(
            f"fz_u{k}"
        )
        cols = list(zip(*trows))
        con.register(
            f"fz_t{k}",
            pa.table({f.name: list(c) for f, c in zip(T_ARROW, cols)}, schema=T_ARROW),
        )
        ucols = list(zip(*urows))
        con.register(
            f"fz_u{k}",
            pa.table(
                {"k": list(ucols[0]), "v": list(ucols[1])},
                schema=pa.schema([("k", pa.int64()), ("v", pa.int64())]),
            ),
        )

    t0 = time.time()
    failures: list[tuple[int, str]] = []
    for i, seed in enumerate(range(FIRST, FIRST + N)):
        sql = _sql_for_case(seed)
        try:
            _run_both(spark, con, sql)
        except AssertionError as e:
            failures.append((seed, str(e).splitlines()[0]))
            print(f"DIVERGENCE seed={seed}: {e}", flush=True)
        if (i + 1) % 100 == 0:
            print(f"# {i + 1}/{N} cases, {len(failures)} divergences,"
                  f" {time.time() - t0:.0f}s", flush=True)
    status = "ALL AGREE" if not failures else f"{len(failures)} DIVERGENCES"
    print(f"{status}: {N} cases (seeds {FIRST}..{FIRST + N - 1})"
          f" in {time.time() - t0:.0f}s")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
