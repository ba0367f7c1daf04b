"""Model-client seam under BATCH semantics (r10, verdict #7).

The missing-evidence item from r9's verdict: the pluggable ModelClient had
only driver-side single-call tests. These tests drive the Arrow-batched
mapInPandas enrichment seam (lineage/enrich.py::enrich_scripts) with a
fault-injecting client and pin:

* per-batch isolation with per-ROW blast radius — a timeout that exhausts
  retries degrades THAT row to an empty enrichment while every other row in
  the same Arrow batch enriches normally;
* bounded retry with exponential backoff — a flaky-once fault succeeds on
  retry; backoff sequence is 1s, 2s, 4s... (sleep injectable);
* A16 recovery — malformed model output degrades to {} with no exception;
* the reference's truncation rule (12,000 chars, bedrock_enrich.py:185-189)
  asserted AT the seam: the script section of the prompt the client
  actually receives is truncated, measured through the real batched path.

Per the reference's own rule, model OUTPUT is never asserted — only the
deterministic plumbing around the injected client.
"""

from __future__ import annotations

import json
import re
import sys

from pyspark.cloudpickle import register_pickle_by_value
from pyspark.sql import Row

from ai_metadata_lineage_pyspark_spark.lineage.enrich import (
    PROMPT_TRUNCATION,
    build_enrich_prompt,
    enrich_one_with_retry,
    enrich_scripts,
)

_SCRIPT_RE = re.compile(r"SCRIPT:\n(.*?)\n\nBASE FACTS:", re.DOTALL)

# the fault-injecting client class lives in this (worker-unimportable) test
# module: ship it by value inside the pickled closure instead of by name
register_pickle_by_value(sys.modules[__name__])


class FaultInjectingClient:
    """Deterministic faults keyed on markers in the script source; replies
    with the observed script-section length so truncation is assertable
    through the seam. Per-prompt call counting makes FLAKY_ONCE fail on
    the first attempt only (proving the retry path)."""

    def __init__(self) -> None:
        self.attempts: dict[str, int] = {}

    def complete(self, prompt: str, max_tokens: int, temperature: float) -> str:
        script = _SCRIPT_RE.search(prompt).group(1)
        n = self.attempts[script[:64]] = self.attempts.get(script[:64], 0) + 1
        if "RAISE_TIMEOUT" in script:
            raise TimeoutError("injected: model call timed out")
        if "FLAKY_ONCE" in script and n == 1:
            raise ConnectionError("injected: transient throttle")
        if "MALFORMED" in script:
            return 'Sure! Here is some prose with no JSON object in it.'
        if "TRUNCATED_REPLY" in script:
            return '```json\n{"group_by": ["a", "b"'  # cut mid-stream
        return json.dumps({"script_len": len(script)})


def _rows():
    big = "x = 1  # BIGSCRIPT\n" + ("# pad pad pad\n" * 2000)  # ~28k chars
    assert len(big) > PROMPT_TRUNCATION
    return [
        Row(script_path="a_ok.py", source="df = spark.read.parquet('p')  # A",
            base_facts_json=json.dumps({"script": "a_ok.py"})),
        Row(script_path="b_timeout.py", source="x = 1  # RAISE_TIMEOUT",
            base_facts_json=json.dumps({"script": "b_timeout.py"})),
        Row(script_path="c_malformed.py", source="x = 2  # MALFORMED",
            base_facts_json=json.dumps({"script": "c_malformed.py"})),
        Row(script_path="d_flaky.py", source="x = 3  # FLAKY_ONCE",
            base_facts_json=json.dumps({"script": "d_flaky.py"})),
        Row(script_path="e_cut.py", source="x = 4  # TRUNCATED_REPLY",
            base_facts_json=json.dumps({"script": "e_cut.py"})),
        Row(script_path="f_big.py", source=big,
            base_facts_json=json.dumps({"script": "f_big.py"})),
    ]


def test_batched_enrichment_per_row_isolation(spark):
    # ONE partition -> every row shares an Arrow batch and a client
    # instance: the strongest isolation claim the seam can make.
    df = spark.createDataFrame(_rows()).coalesce(1)
    out = {
        r["script_path"]: r
        for r in enrich_scripts(df, FaultInjectingClient, max_retries=1).collect()
    }
    assert len(out) == 6

    def enrichment(name):
        merged = json.loads(out[name]["enriched_json"])
        # static truth is never overwritten, faults included
        assert merged["script"] == name
        return merged["model_enrichment"]

    # healthy row in the same batch as every fault: fully enriched
    assert enrichment("a_ok.py")["script_len"] > 0 and out["a_ok.py"]["enrich_ok"]
    # timeout exhausts retries -> empty enrichment, row survives, and the
    # EXPLICIT fault flag is the only enrich_ok=False (r11: the flag tracks
    # client faults, not enrichment emptiness)
    assert enrichment("b_timeout.py") == {} and not out["b_timeout.py"]["enrich_ok"]
    # malformed reply -> A16 degrades to {} without raising; the model DID
    # answer, so this is NOT a fault: enrich_ok stays True (a re-enqueue of
    # enrich_ok=false rows must never loop on deterministic empty replies)
    assert enrichment("c_malformed.py") == {} and out["c_malformed.py"]["enrich_ok"]
    # mid-stream-cut JSON is also an A16 degrade, not a crash, not a fault
    assert enrichment("e_cut.py") == {} and out["e_cut.py"]["enrich_ok"]
    # flaky-once succeeds on the retry
    assert enrichment("d_flaky.py")["script_len"] > 0 and out["d_flaky.py"]["enrich_ok"]
    # 12,000-char truncation rule observed by the client THROUGH the seam
    assert enrichment("f_big.py")["script_len"] == PROMPT_TRUNCATION


def test_batched_enrichment_multi_partition(spark):
    # same rows spread over partitions: a faulty row cannot poison sibling
    # batches either (trivially true given per-row isolation, pinned anyway)
    df = spark.createDataFrame(_rows()).repartition(3)
    out = enrich_scripts(df, FaultInjectingClient, max_retries=1).collect()
    ok = {r["script_path"]: r["enrich_ok"] for r in out}
    assert ok["a_ok.py"] and ok["d_flaky.py"] and ok["f_big.py"]
    assert ok["c_malformed.py"]  # content degrade, not a client fault
    assert not ok["b_timeout.py"]  # the only fault-degraded row


def test_retry_backoff_sequence():
    sleeps: list[int] = []

    class AlwaysTimeout:
        def complete(self, prompt, max_tokens, temperature):
            raise TimeoutError("injected")

    merged, faulted = enrich_one_with_retry(
        AlwaysTimeout(), "src", {"script": "s.py"}, max_retries=3, sleep=sleeps.append
    )
    assert sleeps == [1, 2, 4]  # exponential, bounded by max_retries
    assert merged == {"script": "s.py", "model_enrichment": {}}
    assert faulted  # the explicit fault flag, not inferred from emptiness


def test_retry_stops_after_first_success():
    sleeps: list[int] = []

    class FlakyTwice:
        def __init__(self):
            self.n = 0

        def complete(self, prompt, max_tokens, temperature):
            self.n += 1
            if self.n <= 2:
                raise ConnectionError("injected")
            return json.dumps({"joins": []})

    merged, faulted = enrich_one_with_retry(
        FlakyTwice(), "src", {"script": "s.py"}, max_retries=5, sleep=sleeps.append
    )
    assert sleeps == [1, 2]  # no further attempts after success
    assert merged["model_enrichment"] == {"joins": []}
    assert not faulted


def test_prompt_truncation_rule_both_sections():
    big = "y" * (PROMPT_TRUNCATION * 2)
    prompt = build_enrich_prompt(big, big)
    script = _SCRIPT_RE.search(prompt).group(1)
    facts = prompt.split("BASE FACTS:\n", 1)[1]
    assert len(script) == PROMPT_TRUNCATION
    assert len(facts.rstrip("\n")) == PROMPT_TRUNCATION


def test_circuit_breaker_fails_fast_on_dead_client(spark):
    """A dead client (bad credentials, misconfiguration) must fail the job
    fast, not crawl through a corpus-sized batch paying (max_retries+1)
    calls + backoff per row to produce a uniformly-empty result (r10
    advice). N consecutive fault-degraded rows in one task trip the breaker."""
    import pytest

    rows = [
        Row(script_path=f"dead_{i}.py", source=f"x = {i}  # RAISE_TIMEOUT",
            base_facts_json=json.dumps({"script": f"dead_{i}.py"}))
        for i in range(12)
    ]
    df = spark.createDataFrame(rows).coalesce(1)
    with pytest.raises(Exception, match="circuit breaker"):
        enrich_scripts(
            df, FaultInjectingClient, max_retries=0, circuit_break_after=5
        ).collect()


def test_circuit_breaker_streak_resets_on_healthy_row(spark):
    """Interleaved healthy rows prove the breaker counts CONSECUTIVE faults:
    a corpus with scattered flaky scripts must still complete end-to-end."""
    rows = []
    for i in range(12):
        marker = "# RAISE_TIMEOUT" if i % 2 else f"# healthy {i}"
        rows.append(
            Row(script_path=f"mix_{i}.py", source=f"x = {i}  {marker}",
                base_facts_json=json.dumps({"script": f"mix_{i}.py"}))
        )
    df = spark.createDataFrame(rows).coalesce(1)
    out = enrich_scripts(
        df, FaultInjectingClient, max_retries=0, circuit_break_after=3
    ).collect()
    assert len(out) == 12
    ok = {r["script_path"]: r["enrich_ok"] for r in out}
    assert sum(ok.values()) == 6  # every healthy row enriched, every odd row faulted


def test_circuit_breaker_zero_or_none_disables(spark):
    """circuit_break_after=0 / None means breaker OFF (r11 advice): the old
    `streak >= circuit_break_after` check tripped at streak=0 >= 0 on the
    very FIRST row even when it was healthy, so the natural 'disable' value
    instead failed every task immediately. Disabled means even an all-fault
    corpus completes, degraded row-by-row, never raising."""
    rows = [
        Row(script_path=f"off_{i}.py", source=f"x = {i}  # RAISE_TIMEOUT",
            base_facts_json=json.dumps({"script": f"off_{i}.py"}))
        for i in range(8)
    ]
    df = spark.createDataFrame(rows).coalesce(1)
    for off in (0, None, -1):
        out = enrich_scripts(
            df, FaultInjectingClient, max_retries=0, circuit_break_after=off
        ).collect()
        assert len(out) == 8
        assert not any(r["enrich_ok"] for r in out)  # all fault-degraded, none raised
