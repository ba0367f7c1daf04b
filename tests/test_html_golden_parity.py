"""Structural parity of the lineage overview graph against the reference's
shipped golden HTML (VERDICT r05 next-step #7).

The reference repo ships `outputs/lineage_repo.html`, built by
extractor/build_html.py:233-271 from the 12 example scripts. This test
parses that golden file's overview Mermaid section into (script, direction,
asset) relations and (from_script, asset, to_script) stitch links, runs
THIS repo's extractor + stitcher over the same example scripts, and asserts
set-level equality modulo an explicit allowlist of the reference bugs this
repo deliberately fixes:

* A7  (extractor/static_extract.py read detector): `.option("header", ...)`
  on a reader chain is mis-read as the read asset "header", and the real
  csv path is dropped. Fixed here (lineage/extract.py): the golden carries
  a phantom READ "header" and misses READ s3a://my-bucket/raw/orders/.
* A13 (source/sink classifier): `createOrReplaceTempView("v")` is emitted
  as a WRITE asset named "v". Fixed here: temp views go to
  `temp_views_table`, not the asset table.
* A12-class (write detector): `spark.sql("CREATE TABLE ...")` /
  `spark.sql("MERGE INTO ...")` statements leak the ENTIRE SQL string as a
  write-asset path. Fixed here: DDL/MERGE statements are parsed, not
  pasted.

Everything else — every genuine read/write relation and every cross-script
stitch link — must match the golden exactly.
"""

from __future__ import annotations

import os
import re

import pytest

_GOLDEN = "/root/reference/outputs/lineage_repo.html"
_EXAMPLES = "/root/reference/examples"

# reference-bug relations present ONLY in the golden (see module docstring)
_GOLDEN_ONLY_EXACT = {
    ("script_01_bronze_ingest_orders", "read", "header"),  # A7 phantom
    ("script_04_dim_product_sql_cte", "write", "raw_products"),  # A13
    ("script_06_web_sessionization", "write", "sessions"),  # A13
    ("script_09_sql_merge_inventory", "write", "inv_updates"),  # A13
    ("script_10_mart_customer_value", "write", "cust"),  # A13
    ("script_10_mart_customer_value", "write", "orders"),  # A13
    ("script_10_mart_customer_value", "write", "risk"),  # A13
}

# relations present ONLY in this repo's (fixed) extraction
_OURS_ONLY = {
    # the real read the golden's A7 "header" phantom displaced
    ("script_01_bronze_ingest_orders", "read", "s3a://my-bucket/raw/orders/"),
}


def _parse_golden_overview():
    """(relations, links) from the golden's first Mermaid block.

    Multiline node labels (the A12-class raw-SQL 'assets') are joined
    before parsing so the block tokenizes line-by-line.
    """
    golden = open(_GOLDEN).read()
    m = re.search(r'<h2>1\..*?<div class="mermaid">\n(.*?)</div>', golden, re.S)
    assert m, "golden overview mermaid section not found"
    lines = m.group(1).strip().splitlines()
    joined, buf = [], ""
    for ln in lines:
        if buf:
            buf += "\n" + ln
            if ln.rstrip().endswith('"]'):
                joined.append(buf)
                buf = ""
            continue
        if re.match(r'^\w+\["', ln.strip()) and not ln.rstrip().endswith('"]'):
            buf = ln
        else:
            joined.append(ln)
    nodes: dict[str, str] = {}
    rels, links, sql_writes = set(), set(), set()
    for ln in joined:
        ln = ln.strip()
        if not ln or ln.startswith("flowchart"):
            continue
        nm = re.match(r'^(\w+)\["(.*)"\]$', ln, re.S)
        if nm:
            nodes[nm.group(1)] = nm.group(2)
            continue
        em3 = re.match(r"^(\w+) --> (\w+) --> (\w+)$", ln)
        if em3:
            a, b, c = em3.groups()
            links.add((nodes[a][:-3], nodes[b][7:], nodes[c][:-3]))
            continue
        em = re.match(r"^(\w+) --> (\w+)$", ln)
        if em:
            a, b = em.groups()
            la, lb = nodes.get(a, a), nodes.get(b, b)
            if la.startswith("READ\\n"):
                rels.add((lb[:-3], "read", la[6:]))
            elif lb.startswith("WRITE\\n"):
                label = lb[7:]
                # A12-class: a raw multi-line SQL string pasted as the
                # asset path — collect separately, assert on shape below
                if "\n" in label or label.lstrip().upper().startswith(
                    ("CREATE ", "MERGE ")
                ):
                    sql_writes.add((la[:-3], label))
                else:
                    rels.add((la[:-3], "write", label))
    return rels, links, sql_writes


@pytest.mark.skipif(
    not (os.path.exists(_GOLDEN) and os.path.isdir(_EXAMPLES)),
    reason="reference golden outputs not present",
)
def test_overview_graph_matches_golden(spark):
    from ai_metadata_lineage_pyspark_spark.lineage.extract import (
        assets_table,
        extract_from_dir,
        temp_views_table,
    )
    from ai_metadata_lineage_pyspark_spark.lineage.stitch import stitch_links

    golden_rels, golden_links, golden_sql_writes = _parse_golden_overview()

    facts = extract_from_dir(spark, _EXAMPLES)
    assets = assets_table(facts)
    ours = {
        (r.script_name, r.direction, r.path)
        for r in assets.select("script_name", "direction", "path").distinct().collect()
    }

    # the golden's extra relations are exactly the documented reference bugs
    assert golden_rels - ours == _GOLDEN_ONLY_EXACT
    # our extra relations are exactly what those bugs displaced
    assert ours - golden_rels == _OURS_ONLY
    # the A12-class raw-SQL write "assets" exist in the golden (2: the DDL
    # and the MERGE of script_09) and never leak into our asset table
    assert {s for s, _ in golden_sql_writes} == {"script_09_sql_merge_inventory"}
    assert len(golden_sql_writes) == 2
    assert not any("\n" in p for _, _, p in ours)

    # positive side of the A13 fix: every tempview the golden mislabels as
    # a write asset is classified as a temp view here
    views = {
        (r.script_name, r.view_name)
        for r in temp_views_table(facts).collect()
    }
    mislabelled = {
        (s, p) for s, d, p in _GOLDEN_ONLY_EXACT if d == "write" and "://" not in p
    }
    assert mislabelled <= views

    # cross-script stitch links: exact set parity (normalize trailing '/')
    ourlinks = {
        (r.from_script, r.asset.rstrip("/"), r.to_script)
        for r in stitch_links(assets).collect()
    }
    assert ourlinks == {(f, a.rstrip("/"), t) for f, a, t in golden_links}
