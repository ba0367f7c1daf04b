"""Pluggable LLM enrichment + answer generation.

The reference calls Amazon Bedrock (Nova for enrichment/answers, Titan for
embeddings) — extractor/bedrock_enrich.py:169-248, qa/ask.py:82-113. This
engine keeps the same contract and budgets but isolates every model call
behind `ModelClient`, honoring the reference's core rule: "LLMs assist
understanding — they never define lineage truth" (README.md:111-113).
Deterministic artifacts (facts, edges, stitching, closure, evidence) never
depend on a client; enrichment output is merged under a separate key and
never overwrites static facts (bedrock_enrich.py:234-242 semantics).

No cloud SDK is imported here: `BedrockClient` is a documented integration
point, import-gated so the engine runs fully offline.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass
from typing import Protocol

ENRICH_MAX_TOKENS = 2500  # bedrock_enrich.py:95-97
ENRICH_TEMPERATURE = 0.0
ANSWER_MAX_TOKENS = 900  # qa/ask.py:104
ANSWER_TEMPERATURE = 0.1
PROMPT_TRUNCATION = 12_000  # bedrock_enrich.py:185-189
UNKNOWN_ANSWER = "Unknown from available lineage metadata."


class ModelClient(Protocol):
    def complete(self, prompt: str, max_tokens: int, temperature: float) -> str: ...


@dataclass
class MockModelClient:
    """Deterministic offline client: echoes a fixed JSON envelope, so tests
    can exercise the merge/parse plumbing without asserting model output."""

    payload: dict | None = None

    def complete(self, prompt: str, max_tokens: int, temperature: float) -> str:
        body = self.payload if self.payload is not None else {
            "group_by": [], "aggregations": [], "derived_columns": [],
            "joins": [], "sql_blocks": [],
        }
        return "```json\n" + json.dumps(body) + "\n```"


def extract_json_object(text: str) -> dict | None:
    """Robust JSON extraction: strip code fences, direct parse, else first
    balanced {...} block (bedrock_enrich.py:27-60 semantics, fresh impl)."""
    cleaned = re.sub(r"^```(?:json)?\s*|\s*```$", "", text.strip(), flags=re.MULTILINE)
    try:
        obj = json.loads(cleaned)
        return obj if isinstance(obj, dict) else None
    except json.JSONDecodeError:
        pass
    start = cleaned.find("{")
    while start != -1:
        depth = 0
        for i in range(start, len(cleaned)):
            if cleaned[i] == "{":
                depth += 1
            elif cleaned[i] == "}":
                depth -= 1
                if depth == 0:
                    try:
                        obj = json.loads(cleaned[start : i + 1])
                        return obj if isinstance(obj, dict) else None
                    except json.JSONDecodeError:
                        break
        start = cleaned.find("{", start + 1)
    return None


def build_enrich_prompt(script_source: str, base_facts_json: str) -> str:
    """Prompt = truncated script + truncated base facts + strict JSON schema
    instruction (bedrock_enrich.py:169-213 contract)."""
    return (
        "Analyze this PySpark script and its statically-extracted lineage facts.\n"
        "Return ONLY a JSON object with keys: group_by, aggregations, "
        "derived_columns, joins, sql_blocks.\n\n"
        f"SCRIPT:\n{script_source[:PROMPT_TRUNCATION]}\n\n"
        f"BASE FACTS:\n{base_facts_json[:PROMPT_TRUNCATION]}\n"
    )


def enrich_one(client: ModelClient, script_source: str, base_facts: dict) -> dict:
    """Merge enrichment under its own key; never overwrite static truth."""
    prompt = build_enrich_prompt(script_source, json.dumps(base_facts))
    raw = client.complete(prompt, ENRICH_MAX_TOKENS, ENRICH_TEMPERATURE)
    enrichment = extract_json_object(raw) or {}
    merged = dict(base_facts)
    merged["model_enrichment"] = enrichment
    return merged


def enrich_one_with_retry(
    client: ModelClient,
    script_source: str,
    base_facts: dict,
    max_retries: int = 2,
    sleep=None,
) -> tuple[dict, bool]:
    """enrich_one under bounded retry with exponential backoff.

    Returns ``(merged, faulted)``. Transient client faults (timeouts,
    throttles) retry up to `max_retries` times with 2^attempt-second backoff
    (`sleep` injectable for tests); a still-failing call degrades to an
    EMPTY enrichment with ``faulted=True`` — never an exception — because
    enrichment is advisory by contract ("LLMs assist understanding — they
    never define lineage truth") and one flaky script must not fail a
    corpus-sized batch job. Malformed/truncated model output is NOT a
    fault: extract_json_object already degrades it to {} inside enrich_one
    (A16), the model answered, and at temperature 0 a re-enqueue would get
    the same reply — so ``faulted`` stays False. The explicit flag (r10
    advice) makes a fault-degraded row distinguishable from a genuinely
    empty model reply, so downstream re-enqueue logic never loops on
    legitimately-empty enrichments."""
    if sleep is None:
        import time as _time

        sleep = _time.sleep
    for attempt in range(max_retries + 1):
        try:
            return enrich_one(client, script_source, base_facts), False
        except Exception:  # noqa: BLE001 — any client fault is retryable
            if attempt == max_retries:
                merged = dict(base_facts)
                merged["model_enrichment"] = {}
                return merged, True
            sleep(2**attempt)
    raise AssertionError("unreachable")


CIRCUIT_BREAK_AFTER = 25  # consecutive fault-degraded rows before fail-fast


def enrich_scripts(
    scripts_df,
    client_factory,
    max_retries: int = 2,
    circuit_break_after: int | None = CIRCUIT_BREAK_AFTER,
):
    """Arrow-batched corpus enrichment: the mapInPandas seam a real Bedrock
    client plugs into (reference bedrock_enrich.py:169-248 run per script,
    here per Arrow batch across executors).

    `scripts_df` needs (script_path string, source string, base_facts_json
    string); returns (script_path, enriched_json, enrich_ok). The client is
    built ONCE per task from the picklable zero-arg `client_factory`
    (connection reuse across a batch — never per row, never pickled
    live). Fault semantics, pinned by tests/test_enrich_seam.py: a fault on
    one row is contained to that row (retry -> empty-enrichment fallback via
    enrich_one_with_retry), so neighbors in the same batch and every other
    batch still enrich — per-batch isolation with per-ROW blast radius.
    `enrich_ok` is the EXPLICIT fault flag from enrich_one_with_retry: False
    means the client faulted through every retry, True means the model
    answered (even if the answer degraded to {} via A16) — so a genuinely
    empty enrichment is never confused with a dead client (r10 advice).

    Circuit breaker (r10 advice): `circuit_break_after` consecutive
    fault-degraded rows in one task means the client is dead, not flaky —
    a bad credential or misconfiguration would otherwise pay
    (max_retries+1) calls + ~3s backoff per row across a corpus-sized job
    and crawl to a uniformly-empty result. The task fails fast with a
    RuntimeError instead; a healthy row resets the streak. Passing
    `circuit_break_after=None` or any value <= 0 DISABLES the breaker
    (r11 advice: the natural "off" value of 0 previously tripped on the
    very first row, healthy or not, because streak=0 >= 0)."""
    import pandas as pd

    breaker_on = circuit_break_after is not None and circuit_break_after > 0

    def gen(batches):
        client = client_factory()
        streak = 0
        for pdf in batches:
            enriched, ok = [], []
            for src, facts_json in zip(pdf["source"], pdf["base_facts_json"]):
                base = json.loads(facts_json)
                merged, faulted = enrich_one_with_retry(client, src, base, max_retries)
                streak = streak + 1 if faulted else 0
                if breaker_on and streak >= circuit_break_after:
                    raise RuntimeError(
                        f"enrichment circuit breaker: {streak} consecutive rows "
                        f"exhausted {max_retries} retries — client looks dead "
                        "(bad credentials / misconfiguration), failing fast "
                        "instead of degrading the whole corpus to empty"
                    )
                enriched.append(json.dumps(merged, sort_keys=True))
                ok.append(not faulted)
            yield pd.DataFrame(
                {
                    "script_path": pdf["script_path"],
                    "enriched_json": enriched,
                    "enrich_ok": ok,
                }
            )

    return scripts_df.mapInPandas(
        gen, "script_path string, enriched_json string, enrich_ok boolean"
    )


def answer_question(client: ModelClient, question: str, evidence: str) -> str:
    """Constrained answer generation (qa/ask.py:82-113 contract)."""
    prompt = (
        "Answer ONLY from the EVIDENCE below. If the evidence is "
        f'insufficient, reply exactly "{UNKNOWN_ANSWER}"\n\n'
        f"EVIDENCE:\n{evidence}\n\nQUESTION: {question}\n"
    )
    return client.complete(prompt, ANSWER_MAX_TOKENS, ANSWER_TEMPERATURE)
