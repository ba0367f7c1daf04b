"""Enrichment merge semantics (A15-A16) and Mermaid/HTML render (A21-A23).

Per the reference's own rule ("LLMs assist understanding — they never define
lineage truth", README.md:111-113), model output is never asserted — only
the deterministic parse/merge plumbing around a mocked client.
"""

from __future__ import annotations

from ai_metadata_lineage_pyspark_spark.lineage.enrich import (
    MockModelClient,
    UNKNOWN_ANSWER,
    answer_question,
    build_enrich_prompt,
    enrich_one,
    extract_json_object,
)


def test_extract_json_fenced():
    assert extract_json_object('```json\n{"a": 1}\n```') == {"a": 1}


def test_extract_json_direct():
    assert extract_json_object('{"a": {"b": 2}}') == {"a": {"b": 2}}


def test_extract_json_embedded_in_prose():
    got = extract_json_object('The answer is {"joins": []} as requested.')
    assert got == {"joins": []}


def test_extract_json_garbage_returns_none():
    assert extract_json_object("no json here") is None
    assert extract_json_object("{broken") is None


def test_enrich_merge_never_overwrites_static_truth():
    base = {"script_name": "s1", "columns": [{"col_name": "x"}]}
    client = MockModelClient(payload={"derived_columns": [{"df": "d", "col": "x"}]})
    merged = enrich_one(client, "df = spark.read.parquet('p')", base)
    # static facts intact, enrichment under its own key
    assert merged["script_name"] == "s1"
    assert merged["columns"] == [{"col_name": "x"}]
    assert merged["model_enrichment"] == {"derived_columns": [{"df": "d", "col": "x"}]}
    # input dict not mutated (reference mutates in place — divergence)
    assert "model_enrichment" not in base


def test_prompt_truncation():
    prompt = build_enrich_prompt("x" * 50_000, "y" * 50_000)
    assert len(prompt) < 2 * 12_000 + 500


def test_answer_contract_mentions_unknown():
    class Echo:
        def complete(self, prompt, max_tokens, temperature):
            return prompt

    out = answer_question(Echo(), "q?", "EVIDENCE TEXT")
    assert UNKNOWN_ANSWER in out
    assert "EVIDENCE TEXT" in out


def test_html_render_smoke(spark):
    from ai_metadata_lineage_pyspark_spark.lineage.extract import (
        assets_table,
        columns_table,
        dataframes_table,
        extract_from_dir,
    )
    from ai_metadata_lineage_pyspark_spark.lineage.html import build_html
    from ai_metadata_lineage_pyspark_spark.lineage.postprocess import edges_table
    from ai_metadata_lineage_pyspark_spark.lineage.queries import FIXTURE_DIR
    from ai_metadata_lineage_pyspark_spark.lineage.stitch import stitch_links

    facts = extract_from_dir(spark, FIXTURE_DIR).localCheckpoint(eager=False)
    assets = assets_table(facts)
    edges = edges_table(columns_table(facts), dataframes_table(facts))
    html = build_html(assets, stitch_links(assets), edges)
    assert "flowchart LR" in html and "flowchart TB" in html
    assert "p01_ingest_readings" in html
    # every fixture sink df gets a collapsible per-df section
    assert html.count("<details>") >= 5
