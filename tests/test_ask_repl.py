"""A39: scripted Q&A round-trips through the ask REPL (reference
qa/ask.py:377-388, 457-519 interaction contract)."""

from __future__ import annotations

import io
from dataclasses import dataclass

from ai_metadata_lineage_pyspark_spark.ask import QASession, read_multiline_question
from ai_metadata_lineage_pyspark_spark.lineage.enrich import UNKNOWN_ANSWER

QUESTION = "which columns derive from temp_c and what writes to gold alerts"


@dataclass
class EchoClient:
    """Captures the prompt and answers deterministically from the evidence,
    so the test exercises the full wiring without a model."""

    last_prompt: str = ""

    def complete(self, prompt: str, max_tokens: int, temperature: float) -> str:
        self.last_prompt = prompt
        if "COLUMN IMPACT" in prompt:
            return "impact found"
        return UNKNOWN_ANSWER


def test_read_multiline_question_blank_line_submits():
    q = read_multiline_question(io.StringIO("line one\nline two\n\nignored\n"))
    assert q == "line one\nline two"


def test_read_multiline_question_eof_returns_partial():
    assert read_multiline_question(io.StringIO("only line")) == "only line"
    assert read_multiline_question(io.StringIO("")) == ""


def test_ask_round_trip(spark):
    client = EchoClient()
    qa = QASession.build(spark, client)
    result = qa.ask(QUESTION)

    # the constrained-answer prompt carried both retrieval and deterministic
    # evidence (qa/ask.py evidence contract)
    assert "RETRIEVED DOCS:" in client.last_prompt
    assert f"QUESTION: {QUESTION}" in client.last_prompt
    assert "COLUMN IMPACT temp_c" in result["evidence"]
    assert result["answer"] == "impact found"

    dbg = result["debug"]
    assert dbg["candidate_cols"] == ["temp_c"]
    assert dbg["impacted_scripts"] == 5
    assert dbg["impacted_gold"] == 4
    assert dbg["retrieved_docs"] > 0


def test_ask_unknown_question_stays_constrained(spark):
    qa = QASession.build(spark, EchoClient())
    result = qa.ask("what is the weather on zebra9 xyzzy")
    assert result["debug"]["candidate_cols"] == []
    assert result["answer"] == UNKNOWN_ANSWER
