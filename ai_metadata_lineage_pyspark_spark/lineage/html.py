"""Mermaid/HTML lineage visualization (driver-side render).

Spark-native re-expression of extractor/build_html.py: the graph tables are
small after aggregation, so they are collected and rendered at the driver —
overview flowchart (build_html.py:50-84) + per-dataframe column graphs
(:104-230) + HTML assembly (:233-271).
"""

from __future__ import annotations

import html as _html

from pyspark.sql import DataFrame


def _node_id(name: str) -> str:
    return "".join(ch if ch.isalnum() else "_" for ch in name)


def overview_mermaid(assets: DataFrame, links: DataFrame) -> str:
    lines = ["flowchart LR"]
    for r in assets.select("script_name", "direction", "path").distinct().collect():
        s, a = _node_id(r.script_name), _node_id(r.path)
        lines.append(f'  {s}["{r.script_name}"]')
        lines.append(f'  {a}(("{r.path}"))')
        if r.direction == "read":
            lines.append(f"  {a} --> {s}")
        else:
            lines.append(f"  {s} --> {a}")
    for r in links.collect():
        lines.append(f"  {_node_id(r.from_script)} -. {r.asset} .-> {_node_id(r.to_script)}")
    return "\n".join(dict.fromkeys(lines))


def df_mermaid(edges: DataFrame, script_name: str, df_name: str) -> str:
    lines = ["flowchart TB"]
    rows = edges.filter(
        (edges.script_name == script_name) & (edges.df_name == df_name)
    ).collect()
    for r in rows:
        lines.append(f"  {_node_id(r.src_col)}[{r.src_col}] --> {_node_id(r.target_col)}[{r.target_col}]")
    return "\n".join(dict.fromkeys(lines))


def build_html(assets: DataFrame, links: DataFrame, edges: DataFrame) -> str:
    parts = [
        "<html><head><meta charset='utf-8'>",
        '<script type="module">import mermaid from '
        '"https://cdn.jsdelivr.net/npm/mermaid@10/dist/mermaid.esm.min.mjs";'
        "mermaid.initialize({startOnLoad:true});</script>",
        "</head><body><h1>Lineage</h1>",
        f'<div class="mermaid">{_html.escape(overview_mermaid(assets, links))}</div>',
    ]
    pairs = edges.select("script_name", "df_name").distinct().collect()
    for r in sorted(pairs, key=lambda x: (x.script_name, x.df_name)):
        parts.append(
            f"<details><summary>{_html.escape(r.script_name)}.{_html.escape(r.df_name)}</summary>"
            f'<div class="mermaid">{_html.escape(df_mermaid(edges, r.script_name, r.df_name))}</div>'
            "</details>"
        )
    parts.append("</body></html>")
    return "\n".join(parts)
