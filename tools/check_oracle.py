"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every registered query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, column names/order-insensitive
value multiset. Values are canonicalized to strings (floats via repr, dates/
timestamps via isoformat) before hashing so the comparison is as strict as
the driver's.

Usage:  python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as dt
import decimal
import hashlib
import math
import sys
import time

import duckdb

sys.path.insert(0, ".")

from ai_metadata_lineage_pyspark_spark.registry import all_queries  # noqa: E402
from ai_metadata_lineage_pyspark_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def fixture_scale(sf_dir: str) -> float | None:
    """Best-effort scale factor of a fixture dir, for max_sf gating.

    Parses the trailing ``sf<number>`` in the directory name (covers the
    driver's /root/testdata/sf0.001..sf0.1 and replica dirs like
    /tmp/testdata_sf1). Returns None when undeterminable — max_sf-gated
    queries are then SKIPPED LOUDLY unless --force is passed (r11, advice:
    fail-open here previously meant a quadratic ground-truth harness could
    run ungated over a replica dir like adv10x, >35 min/engine).
    """
    import re

    m = re.search(r"sf_?([0-9]+(?:\.[0-9]+)?)/?$", sf_dir.rstrip("/").rsplit("/", 1)[-1])
    return float(m.group(1)) if m else None


def max_sf_skip_reason(q, scale: float | None, force: bool = False) -> str | None:
    """SKIP message when a max_sf-contracted query must not run at this
    fixture scale, else None (run it). Shared by check_oracle /
    subset_oracle so the gating semantics cannot drift.

    * scale known and above the contract -> SKIP (the documented demotion);
    * scale UNDETERMINABLE (replica dirs without an sf suffix) -> SKIP with
      a loud warning rather than silently running an unbounded quadratic
      baseline; --force runs it anyway (explicit operator override).
    """
    if q.max_sf is None:
        return None
    if scale is None:
        if force:
            return None
        return (
            f"fixture scale UNDETERMINABLE from dir name; refusing to run "
            f"max_sf={q.max_sf} ground-truth harness blind (pass --force to "
            f"override)"
        )
    if scale > q.max_sf:
        return f"documented ground-truth harness, max_sf={q.max_sf} < fixture sf={scale}"
    return None


def canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return "0.0"  # normalize -0.0
        return repr(v)
    if isinstance(v, decimal.Decimal):
        # Type-sensitive on purpose: DuckDB widens SUM(integer) to
        # DECIMAL(38,0)/HUGEINT while Spark returns BIGINT, and the external
        # driver's hasher distinguishes them (round-1 hash failures). Spark
        # never yields Decimal in this repo, so any Decimal here means the
        # oracle SQL is missing a CAST(... AS BIGINT/DOUBLE).
        return f"decimal:{v}"
    if isinstance(v, dt.datetime):
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    hashes = sorted(
        hashlib.md5("\x1f".join(canon(r[i]) for i in order).encode()).hexdigest() for r in rows
    )
    return hashlib.md5("\n".join(hashes).encode()).hexdigest()


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--force"]
    force = "--force" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    spark = get_spark("check-oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    failures = []
    scale = fixture_scale(sf_dir)
    for name, q in sorted(all_queries().items()):
        if only and name not in only:
            continue
        skip = max_sf_skip_reason(q, scale, force)
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
            print(f"ok?  {name}: rows-only check, {len(srows)} rows ({time.time()-t0:.1f}s)")
            if len(srows) == 0:
                failures.append(name)
                print(f"FAIL {name}: zero rows")
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
            # show a few differing rows for debugging
            order_s = sorted(range(len(scols)), key=lambda i: scols[i])
            order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
            sset = {tuple(canon(r[i]) for i in order_s) for r in srows}
            dset = {tuple(canon(r[i]) for i in order_d) for r in drows}
            for r in list(sset - dset)[:3]:
                print(f"  spark-only: {r}")
            for r in list(dset - sset)[:3]:
                print(f"  oracle-only: {r}")
        if problems:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(f"PASS {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
    print(f"\n{'ALL GREEN' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
