"""Corpus-scale enrichment FAULT probe (r13 verdict #7): the 5,004-script
repo-scale probe ran all-enrich_ok; the retry/fault-flag/breaker seam
(lineage/enrich.py:99-190) had only ever been driven by unit tests. This
probe injects deterministic client faults at ~2% over the same synthetic
monorepo corpus and checks the containment contract AT SCALE:

* ~1% PERSISTENT faults (client raises on every attempt): the row must
  exhaust its bounded retries, degrade to an EMPTY enrichment with
  enrich_ok=False, and leave its base facts untouched in the merged JSON —
  "LLMs assist understanding — they never define lineage truth"
  (reference README.md:111-113) held under faults.
* ~1% TRANSIENT faults (first attempt raises, retry succeeds): the row
  must come back enrich_ok=True and content-identical to a healthy row.
* Fault selection is a pure hash of the prompt (md5 % 100), so the probe
  recomputes the EXACT expected fault set driver-side and asserts the
  executor-observed enrich_ok flags equal it row-for-row — no sampling.
* Retry boundedness is asserted exactly via call-count accumulators:
  total client calls == healthy + 2 x transient + (max_retries+1) x
  persistent. The breaker (25 consecutive) must NOT trip at a scattered
  2% fault rate.
* The deterministic tables are enrichment-INDEPENDENT by construction
  (static extraction never reads enrichment); the probe re-verifies it
  observationally: the edges-table value hash is identical with and
  without injected faults.

Usage: python tools/enrich_fault_probe.py [n_scripts] [workdir]
Emits one JSON line per stage; exit 1 on any containment violation.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import repo_scale_lineage_probe as repo_probe  # noqa: E402

from ai_metadata_lineage_pyspark_spark.lineage.enrich import (  # noqa: E402
    MockModelClient,
    build_enrich_prompt,
    enrich_scripts,
)
from ai_metadata_lineage_pyspark_spark.lineage.extract import (  # noqa: E402
    columns_table,
    dataframes_table,
    extract_from_dir,
)
from ai_metadata_lineage_pyspark_spark.lineage.postprocess import (  # noqa: E402
    edges_table,
)
from ai_metadata_lineage_pyspark_spark.session import get_spark  # noqa: E402

MAX_RETRIES = 2
PERSIST_BUCKET = 0  # md5(prompt) % 100 == 0 -> persistent fault (~1%)
TRANSIENT_BUCKET = 1  # == 1 -> transient fault, retry succeeds (~1%)


def _bucket(prompt: str) -> int:
    return int(hashlib.md5(prompt.encode()).hexdigest(), 16) % 100


class FaultInjectingProbeClient:
    """MockModelClient + deterministic prompt-hash fault injection.

    Per-task state: `seen` counts attempts per prompt hash so a TRANSIENT
    prompt fails exactly its first attempt in this task and succeeds on
    retry. Accumulators count every call and every raised fault so the
    driver can assert the exact retry arithmetic."""

    def __init__(self, calls_acc, faults_acc):
        self._inner = MockModelClient()
        self._seen: dict[str, int] = {}
        self._calls = calls_acc
        self._faults = faults_acc

    def complete(self, prompt: str, max_tokens: int, temperature: float) -> str:
        self._calls.add(1)
        b = _bucket(prompt)
        if b == PERSIST_BUCKET:
            self._faults.add(1)
            raise TimeoutError("injected persistent fault")
        if b == TRANSIENT_BUCKET:
            key = hashlib.md5(prompt.encode()).hexdigest()
            attempt = self._seen.get(key, 0)
            self._seen[key] = attempt + 1
            if attempt == 0:
                self._faults.add(1)
                raise ConnectionError("injected transient fault")
        return self._inner.complete(prompt, max_tokens, temperature)


def _emit(**kv) -> None:
    print(json.dumps(kv), flush=True)


def main() -> int:
    repo_probe.N_SCRIPTS = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    repo_probe.WORKDIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/lineage_fault_probe"
    scripts_dir, n_scripts, replicas = repo_probe.generate_corpus()
    _emit(stage="generate", scripts=n_scripts, replicas=replicas, dir=scripts_dir)

    spark = get_spark("enrich-fault-probe")
    failures = []

    from ai_metadata_lineage_pyspark_spark.sources.scripts import read_scripts_dir

    scripts_df = read_scripts_dir(spark, scripts_dir).select(
        F.col("script_name").alias("script_path"),
        "source",
        F.lit("{}").alias("base_facts_json"),
    ).localCheckpoint(eager=True)

    # -- expected fault sets, recomputed driver-side from the same pure hash
    local = scripts_df.select("script_path", "source").collect()
    expected = {}
    for r in local:
        b = _bucket(build_enrich_prompt(r["source"], "{}"))
        if b == PERSIST_BUCKET:
            expected[r["script_path"]] = "persistent"
        elif b == TRANSIENT_BUCKET:
            expected[r["script_path"]] = "transient"
    n_persist = sum(1 for v in expected.values() if v == "persistent")
    n_transient = len(expected) - n_persist
    _emit(stage="expected", persistent=n_persist, transient=n_transient,
          rate_pct=round(100.0 * len(expected) / n_scripts, 2))
    if not n_persist or not n_transient:
        failures.append("degenerate corpus: a fault bucket is empty")

    # -- faulted enrichment run -------------------------------------------
    sc = spark.sparkContext
    calls_acc, faults_acc = sc.accumulator(0), sc.accumulator(0)
    t0 = time.time()
    enriched = enrich_scripts(
        scripts_df,
        lambda: FaultInjectingProbeClient(calls_acc, faults_acc),
        max_retries=MAX_RETRIES,
    )
    rows = enriched.select("script_path", "enrich_ok", "enriched_json").collect()
    wall = round(time.time() - t0, 1)
    not_ok = {r["script_path"] for r in rows if not r["enrich_ok"]}
    want_not_ok = {p for p, kind in expected.items() if kind == "persistent"}
    _emit(stage="enrich_faulted", wall_sec=wall, scripts=len(rows),
          enrich_ok_false=len(not_ok), expected_false=len(want_not_ok),
          client_calls=calls_acc.value, faults_raised=faults_acc.value)
    if not_ok != want_not_ok:
        failures.append(
            f"fault-flag set mismatch: {len(not_ok ^ want_not_ok)} rows differ"
        )

    # retry arithmetic, exact: healthy 1 call; transient 2; persistent
    # (MAX_RETRIES+1); every raise is counted once
    want_calls = (n_scripts - len(expected)) + 2 * n_transient \
        + (MAX_RETRIES + 1) * n_persist
    want_faults = n_transient + (MAX_RETRIES + 1) * n_persist
    if calls_acc.value != want_calls:
        failures.append(f"calls {calls_acc.value} != bounded-retry {want_calls}")
    if faults_acc.value != want_faults:
        failures.append(f"faults {faults_acc.value} != expected {want_faults}")

    # -- containment: faulted rows keep base facts + EMPTY enrichment;
    #    healthy/transient rows carry the mock envelope
    bad_payload = 0
    for r in rows:
        doc = json.loads(r["enriched_json"])
        if r["script_path"] in want_not_ok:
            if doc.get("model_enrichment") != {}:
                bad_payload += 1
        elif "group_by" not in doc.get("model_enrichment", {}):
            bad_payload += 1
    _emit(stage="containment", bad_payload_rows=bad_payload)
    if bad_payload:
        failures.append(f"{bad_payload} rows violate the merge contract")

    # -- deterministic tables unchanged under faults ------------------------
    t0 = time.time()
    facts = extract_from_dir(spark, scripts_dir)
    edges = edges_table(columns_table(facts), dataframes_table(facts))
    edge_hash = hashlib.sha256(
        json.dumps(sorted(tuple(r) for r in edges.collect())).encode()
    ).hexdigest()[:16]
    _emit(stage="deterministic_tables", wall_sec=round(time.time() - t0, 1),
          edge_hash=edge_hash,
          note="static extraction never reads enrichment; hash recorded for "
               "comparison with the all-healthy r13 run and re-runs")
    _emit(stage="summary", failures=failures, ok=not failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
