"""Driver-contract tests: registry shape, __spark_entry__ views, oracle
hygiene (no unknown tables, aliased columns on both sides).
"""

from __future__ import annotations

import re

import __spark_entry__ as entry_mod
from ai_metadata_lineage_pyspark_spark.registry import all_queries

ALLOWED_TABLES = set(
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def test_registry_imports_without_spark_session():
    # all_queries() must work before any SparkSession exists — the driver
    # and bench probe the registry first. (Regression: module-level F.lit.)
    qs = all_queries()
    assert len(qs) >= 30


def test_entry_views_match_registry():
    qs = all_queries()
    assert set(entry_mod.queries()) == set(qs)
    oracles = entry_mod.oracle_sql()
    for name, sql in oracles.items():
        assert sql == qs[name].oracle


# Queries that are rows-only BY DESIGN (oracle=None): sketch-backed approx
# variants whose answers are accuracy-bounded rather than bit-reproducible
# (error bounds pinned in tests/test_approx.py). The capped components path
# graduated to a full hash-check in r05 via a DuckDB replay of its own
# capped star/clique semantics (_capped_components_oracle).
# Anything else missing an oracle is a bug.
ROWS_ONLY_BY_DESIGN = {
    "table_profile_approx",
    "customer_value_deciles_approx",
}


def test_every_query_has_an_oracle():
    # Stronger than the driver's requirement: we claim full SQL
    # expressibility outside the explicit rows-only allowlist.
    for name, q in all_queries().items():
        if name in ROWS_ONLY_BY_DESIGN:
            assert q.oracle is None
            continue
        assert q.oracle, f"{name} has no oracle"


def test_oracle_references_only_known_tables():
    # Any FROM/JOIN target must be a fixture view, a CTE defined in the same
    # statement, or an inline VALUES subquery.
    for name, q in all_queries().items():
        if q.oracle is None:
            continue
        # string literals (golden VALUES rows) may contain prose like
        # "derive from temp_c" — drop them before scanning for table refs
        sql = re.sub(r"'[^']*'", "''", q.oracle)
        ctes = set(
            re.findall(
                r"(?:WITH|,)\s*(?:RECURSIVE\s+)?(\w+)\s*(?:\([\w,\s]*\))?"
                r"\s+AS\s*(?:MATERIALIZED\s*)?\(",
                sql,
                re.I,
            )
        )
        refs = set(re.findall(r"(?:FROM|JOIN)\s+(\w+)", sql, re.I))
        # table functions are valid FROM/JOIN targets, not tables
        unknown = refs - ALLOWED_TABLES - ctes - {"read_parquet", "generate_series", "read_text", "lateral", "LATERAL"}
        # inline VALUES produce derived tables aliased AS t(...): FROM (VALUES...)
        assert not unknown, f"{name}: unknown tables {unknown}"


def test_bench_queries_are_registered():
    bench = [n for n, q in all_queries().items() if q.bench]
    assert len(bench) >= 3


def test_max_sf_demotions_are_the_documented_set():
    """max_sf formally demotes a query to a bounded ground-truth harness —
    the list must stay deliberate. r10: ngram_jaccard_pairs (TRUE output
    quadratic in the corpus; linear twin chargram_minhash_pairs is
    unbounded). r11: cosine_topk (|Q| ∝ corpus ⇒ |Q|·N quadratic work by
    contract; max_sf=1 because the sf1 anchor measured 4.64× wall for 10×
    — still computable — and the corpus-linear twin cosine_topk_panel is
    the production contract above). A new entry here needs a docstring
    demotion note."""
    gated = {n: q.max_sf for n, q in all_queries().items() if q.max_sf is not None}
    assert gated == {"ngram_jaccard_pairs": 0.1, "cosine_topk": 1.0}


def test_fixture_scale_gating():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from check_oracle import fixture_scale, max_sf_skip_reason

    assert fixture_scale("/root/testdata/sf0.001") == 0.001
    assert fixture_scale("/root/testdata/sf0.1/") == 0.1
    assert fixture_scale("/tmp/testdata_sf1") == 1.0
    assert fixture_scale("/tmp/somereplica") is None

    qs = all_queries()
    gated, ungated = qs["ngram_jaccard_pairs"], qs["exact_dedup"]
    # known scale: contract applies strictly above max_sf
    assert max_sf_skip_reason(gated, 0.1) is None
    assert "max_sf=0.1" in max_sf_skip_reason(gated, 1.0)
    # UNDETERMINABLE scale now fails CLOSED for contracted queries (r11
    # advice: a quadratic harness must never run blind over a replica dir)
    # unless --force is explicit; unbounded queries always run
    assert "UNDETERMINABLE" in max_sf_skip_reason(gated, None)
    assert max_sf_skip_reason(gated, None, force=True) is None
    assert max_sf_skip_reason(ungated, None) is None
    # the r11 demotion: cosine_topk contracted to sf<=1
    assert max_sf_skip_reason(qs["cosine_topk"], 1.0) is None
    assert "max_sf=1.0" in max_sf_skip_reason(qs["cosine_topk"], 10.0)


def test_registry_covered_by_newest_final_sweep_log():
    """Structural fix for the r9/r10 end-of-round-gate lapses (verdict r10
    #2): twice a query was registered AFTER the committed sweep logs
    (r9 `chargram_minhash_pairs`, r10 `domain_doc_cap`), shipping with zero
    builder-side verification. This test makes a third recurrence
    impossible: every registered query name must appear as PASS / ok? /
    SKIP in the NEWEST committed `ARTIFACTS/r*_oracle_sweep_final_sf0.001.log`
    — so registering a query without re-running and committing the sf0.001
    sweep fails `pytest tests/` on the spot. FAIL lines do not count as
    coverage, and a log whose tail is not ALL GREEN fails outright."""
    import glob
    import os
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    logs = glob.glob(os.path.join(repo, "ARTIFACTS", "r*_oracle_sweep_final_sf0.001.log"))
    assert logs, "no committed final sf0.001 sweep log found in ARTIFACTS/"
    # r11 advice: filter glob hits through the round-number regex BEFORE
    # max() — a stray ARTIFACTS file matching the glob but not named
    # r<digits>_... previously raised AttributeError instead of a readable
    # assertion
    numbered = [
        (int(m.group(1)), p)
        for p in logs
        if (m := re.match(r"r(\d+)_", os.path.basename(p)))
    ]
    assert numbered, f"no r<digits>_ final sweep log among {sorted(logs)}"
    newest = max(numbered)[1]
    with open(newest) as f:
        lines = f.read().splitlines()
    assert lines and lines[-1].strip() == "ALL GREEN", (
        f"{os.path.basename(newest)} does not end in ALL GREEN"
    )
    # SKIP counts as coverage ONLY for the documented max_sf demotion
    # message (the sweep SAW the query and applied its contract). An
    # UNDETERMINABLE-scale SKIP means the sweep ran BLIND over a dir whose
    # scale it couldn't parse — that's not verification (r11 advice).
    covered = {
        m.group(2)
        for line in lines
        if (m := re.match(r"(PASS|ok\?)\s+(\w+):", line))
        or (
            (m := re.match(r"(SKIP)\s+(\w+):", line))
            and "documented ground-truth harness, max_sf=" in line
        )
    }
    missing = sorted(set(all_queries()) - covered)
    assert not missing, (
        f"registered but absent from {os.path.basename(newest)}: {missing} — "
        "run `python tools/check_oracle.py /root/testdata/sf0.001` and commit "
        "the log BEFORE registering a query"
    )


def test_pyscripts_datasource_matches_text_source(spark):
    """The custom DataSource route and the built-in wholetext route must
    read the identical script corpus."""
    from ai_metadata_lineage_pyspark_spark.lineage.queries import FIXTURE_DIR
    from ai_metadata_lineage_pyspark_spark.sources.pydatasource import (
        read_scripts_datasource,
    )
    from ai_metadata_lineage_pyspark_spark.sources.scripts import read_scripts_dir

    via_ds = {
        (r["script_name"], r["source"])
        for r in read_scripts_datasource(spark, FIXTURE_DIR).collect()
    }
    via_text = {
        (r["script_name"], r["source"])
        for r in read_scripts_dir(spark, FIXTURE_DIR).collect()
    }
    assert via_ds == via_text and len(via_ds) > 0
