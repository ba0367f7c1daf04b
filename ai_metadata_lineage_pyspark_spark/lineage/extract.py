"""Static lineage-fact extraction from PySpark scripts.

The Spark-native re-expression of the reference's extractor
(/root/reference/extractor/static_extract.py:109-279): scripts become rows
of a DataFrame (see sources/scripts.py), a per-row Python function parses
each script's AST and emits one struct of facts, and the facts explode into
four typed tables (scripts / dataframes / columns / assets). AST parsing is
per-file CPU work — embarrassingly parallel, no shuffle — so a Python UDF is
the right tool here (SURVEY.md §2A A3).

Deliberate divergences from reference quirks (documented per SURVEY.md §2A):
* A7  — `spark.read.option(...)` chains are not emitted as reads with
        format "option"; the format is the terminal reader method.
* A10 — all aggregate functions (sum/min/max/avg/count/countDistinct/first/
        last/collect_set) yield `derived_from`, not only F.sum.
* A11 — joins record positional AND keyword on/how arguments; expression
        conditions are captured with expression text and empty key list.
* A12 — the writing DataFrame's name resolves through chained writer calls;
        `createOrReplaceTempView` is recorded as a temp view, not a write.
* A13 — source/sink classification is by actual read/write usage, not
        first/last assignment order (the reference marks `spark` as a sink
        in scripts with a __main__ block).

The analyzer itself is a fresh implementation: a statement-order walk that
maintains a constant-string table for path resolution and flattens fluent
call chains (`df.withColumn(...).filter(...)`) into (base, [ops]).
"""

from __future__ import annotations

import ast
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_READ_FORMATS = {"parquet", "csv", "json", "orc", "text", "load"}
_WRITE_FORMATS = {"parquet", "csv", "json", "orc", "text", "save"}
_AGG_FUNCS = {
    "sum", "min", "max", "avg", "mean", "count", "countDistinct", "count_distinct",
    "first", "last", "collect_set", "collect_list",
}

FACTS_SCHEMA = T.StructType(
    [
        T.StructField("script_name", T.StringType()),
        T.StructField("parse_ok", T.BooleanType()),
        T.StructField(
            "assets",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("direction", T.StringType()),
                        T.StructField("format", T.StringType()),
                        T.StructField("path", T.StringType()),
                        T.StructField("df_name", T.StringType()),
                        T.StructField("partition_by", T.ArrayType(T.StringType())),
                    ]
                )
            ),
        ),
        T.StructField(
            "dataframes",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("df_name", T.StringType()),
                        T.StructField("df_type", T.StringType()),
                        T.StructField("input_dfs", T.ArrayType(T.StringType())),
                        T.StructField("order", T.IntegerType()),
                    ]
                )
            ),
        ),
        T.StructField(
            "columns",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("df_name", T.StringType()),
                        T.StructField("col_name", T.StringType()),
                        T.StructField("transformation", T.StringType()),
                        T.StructField("expression", T.StringType()),
                        T.StructField("derived_from", T.ArrayType(T.StringType())),
                    ]
                )
            ),
        ),
        T.StructField(
            "temp_views",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("view_name", T.StringType()),
                        T.StructField("df_name", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField(
            "sql_blocks",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("df_name", T.StringType()),
                        T.StructField("sql", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)


@dataclass
class _ChainCall:
    method: str
    args: list[ast.expr]
    kwargs: dict[str, ast.expr]


@dataclass
class _Facts:
    assets: list[dict] = field(default_factory=list)
    dataframes: list[dict] = field(default_factory=list)
    columns: list[dict] = field(default_factory=list)
    temp_views: list[dict] = field(default_factory=list)
    sql_blocks: list[dict] = field(default_factory=list)


def _flatten_chain(expr: ast.expr) -> tuple[str | None, list[_ChainCall]]:
    """Flatten `base.m1(a).m2(b)...` into (base_name, [calls in order])."""
    calls: list[_ChainCall] = []
    node = expr
    while True:
        if isinstance(node, ast.Call) and isinstance(node.func, ast.Attribute):
            calls.append(
                _ChainCall(
                    method=node.func.attr,
                    args=list(node.args),
                    kwargs={kw.arg: kw.value for kw in node.keywords if kw.arg},
                )
            )
            node = node.func.value
        elif isinstance(node, ast.Attribute):
            calls.append(_ChainCall(method=node.attr, args=[], kwargs={}))
            node = node.value
        elif isinstance(node, ast.Name):
            return node.id, list(reversed(calls))
        else:
            return None, list(reversed(calls))


def _const_str(node: ast.expr | None, strings: dict[str, str]) -> str | None:
    """Resolve a string literal or a name bound to one earlier."""
    if isinstance(node, ast.Constant) and isinstance(node.value, str):
        return node.value
    if isinstance(node, ast.Name):
        return strings.get(node.id)
    return None


# F.* functions whose string arguments name input columns (unlike e.g.
# F.lit / F.when literal branches).
_COL_ARG_FUNCS = {
    "col", "column", "lag", "lead", "to_timestamp", "to_date", "coalesce",
    "upper", "lower", "abs", "regexp_extract", "concat_ws", "length", "trim",
} | _AGG_FUNCS


def _referenced_cols(node: ast.expr) -> list[str]:
    """Column names referenced in an expression: string args of F.col / of
    known column-taking functions, order-preserving unique."""
    out: list[str] = []
    for sub in ast.walk(node):
        if isinstance(sub, ast.Call):
            base, chain = _flatten_chain(sub)
            if base == "F" and chain and chain[0].method in _COL_ARG_FUNCS:
                for arg in chain[0].args:
                    if isinstance(arg, ast.Constant) and isinstance(arg.value, str):
                        v = arg.value
                        if v.isidentifier():
                            out.append(v)
    seen: set[str] = set()
    return [c for c in out if not (c in seen or seen.add(c))]


def _agg_column(node: ast.expr) -> dict | None:
    """Parse `F.<agg>("col"[, ...]).alias("name")` into a column record."""
    if not (isinstance(node, ast.Call) and isinstance(node.func, ast.Attribute)):
        return None
    if node.func.attr != "alias" or not node.args:
        return None
    alias = node.args[0]
    if not (isinstance(alias, ast.Constant) and isinstance(alias.value, str)):
        return None
    inner = node.func.value
    if not isinstance(inner, ast.Call):
        return None
    base, chain = _flatten_chain(inner)
    if base != "F" or not chain or chain[0].method not in _AGG_FUNCS:
        return None
    srcs = [
        a.value
        for a in chain[0].args
        if isinstance(a, ast.Constant) and isinstance(a.value, str)
    ]
    return {
        "col_name": alias.value,
        "transformation": "aggregation",
        "expression": ast.unparse(inner),
        "derived_from": srcs,
    }


def extract_script_facts(script_name: str, source: str) -> dict:
    """Pure-Python fact extraction for one script (unit-testable)."""
    facts = _Facts()
    strings: dict[str, str] = {}
    df_inputs: dict[str, list[str]] = {}
    df_order: dict[str, int] = {}
    read_dfs: set[str] = set()
    written_dfs: set[str] = set()
    order = 0

    try:
        tree = ast.parse(source)
    except SyntaxError:
        return {
            "script_name": script_name,
            "parse_ok": False,
            "assets": [],
            "dataframes": [],
            "columns": [],
            "temp_views": [],
            "sql_blocks": [],
        }

    def handle_assign(target_name: str, value: ast.expr) -> None:
        nonlocal order
        # constant-string table for later path resolution
        if isinstance(value, ast.Constant) and isinstance(value.value, str):
            strings[target_name] = value.value
            return
        base, chain = _flatten_chain(value)
        if not chain:
            # plain alias `dfB = dfA`
            if isinstance(value, ast.Name) and value.id in df_order:
                df_order[target_name] = order = order + 1
                df_inputs[target_name] = [value.id]
            return

        methods = [c.method for c in chain]

        # --- reads: spark.read...<fmt>(path) --------------------------------
        if base == "spark" and methods and methods[0] == "read":
            fmt, path = None, None
            for call in chain[1:]:
                if call.method in _READ_FORMATS:
                    fmt = call.method
                    path = _const_str(call.args[0] if call.args else None, strings)
            if fmt:
                facts.assets.append(
                    {
                        "direction": "read",
                        "format": fmt,
                        "path": path,
                        "df_name": target_name,
                        "partition_by": [],
                    }
                )
                df_order[target_name] = order = order + 1
                df_inputs[target_name] = []
                read_dfs.add(target_name)
            return

        # --- spark.sql("...") ----------------------------------------------
        if base == "spark" and methods == ["sql"]:
            sql_text = _const_str(chain[0].args[0] if chain[0].args else None, strings)
            if sql_text is not None:
                facts.sql_blocks.append({"df_name": target_name, "sql": sql_text})
            df_order[target_name] = order = order + 1
            df_inputs[target_name] = []
            return

        # --- fluent transformation chain on an existing df ------------------
        if base is None or base not in df_order:
            return
        df_order[target_name] = order = order + 1
        inputs = [base]
        group_keys: list[str] = []
        for call in chain:
            if call.method == "withColumn" and len(call.args) >= 2:
                name = _const_str(call.args[0], strings)
                if name:
                    facts.columns.append(
                        {
                            "df_name": target_name,
                            "col_name": name,
                            "transformation": "withColumn",
                            "expression": ast.unparse(call.args[1]),
                            "derived_from": _referenced_cols(call.args[1]),
                        }
                    )
            elif call.method == "groupBy":
                for arg in call.args:
                    key = _const_str(arg, strings)
                    if key:
                        group_keys.append(key)
                        facts.columns.append(
                            {
                                "df_name": target_name,
                                "col_name": key,
                                "transformation": "groupByKey",
                                "expression": f"groupBy('{key}')",
                                "derived_from": [key],
                            }
                        )
            elif call.method == "agg":
                for arg in call.args:
                    rec = _agg_column(arg)
                    if rec:
                        facts.columns.append({"df_name": target_name, **rec})
            elif call.method == "join":
                right = call.args[0] if call.args else call.kwargs.get("other")
                right_base, _ = _flatten_chain(right) if right is not None else (None, [])
                if right_base is None and isinstance(right, ast.Name):
                    right_base = right.id
                on = call.kwargs.get("on", call.args[1] if len(call.args) > 1 else None)
                how_node = call.kwargs.get("how", call.args[2] if len(call.args) > 2 else None)
                how = _const_str(how_node, strings) or "inner"
                on_cols: list[str] = []
                on_expr = ""
                if on is not None:
                    key = _const_str(on, strings)
                    if key:
                        on_cols = [key]
                    elif isinstance(on, (ast.List, ast.Tuple)):
                        on_cols = [
                            s
                            for el in on.elts
                            if (s := _const_str(el, strings)) is not None
                        ]
                    else:
                        on_expr = ast.unparse(on)
                if right_base:
                    inputs.append(right_base)
                    facts.columns.append(
                        {
                            "df_name": target_name,
                            "col_name": f"__join__{right_base}",
                            "transformation": "join",
                            "expression": f"join({right_base}, on={on_cols or on_expr!r}, how='{how}')",
                            "derived_from": on_cols,
                        }
                    )
        df_inputs[target_name] = inputs

    def handle_expr_stmt(value: ast.expr) -> None:
        base, chain = _flatten_chain(value)
        if base is None or not chain:
            return
        methods = [c.method for c in chain]
        # temp view registration (NOT a write — reference quirk A12)
        if methods and methods[-1] == "createOrReplaceTempView":
            view = _const_str(chain[-1].args[0] if chain[-1].args else None, strings)
            if view and base in df_order:
                facts.temp_views.append({"view_name": view, "df_name": base})
            return
        # writes: <df>.write....<fmt>(path)
        if "write" in methods and base in df_order:
            fmt, path, parts = None, None, []
            for call in chain:
                if call.method in _WRITE_FORMATS and call.args:
                    p = _const_str(call.args[0], strings)
                    if p is not None:
                        fmt, path = call.method, p
                elif call.method == "format" and call.args:
                    declared = _const_str(call.args[0], strings)
                    if declared:
                        fmt = declared
                elif call.method == "partitionBy":
                    parts = [
                        s
                        for a in call.args
                        if (s := _const_str(a, strings)) is not None
                    ]
            if path is not None:
                facts.assets.append(
                    {
                        "direction": "write",
                        "format": fmt,
                        "path": path,
                        "df_name": base,
                        "partition_by": parts,
                    }
                )
                written_dfs.add(base)

    def walk_body(body: list[ast.stmt]) -> None:
        for stmt in body:
            if isinstance(stmt, ast.Assign) and len(stmt.targets) == 1 and isinstance(
                stmt.targets[0], ast.Name
            ):
                handle_assign(stmt.targets[0].id, stmt.value)
            elif isinstance(stmt, ast.Expr):
                handle_expr_stmt(stmt.value)
            elif isinstance(stmt, (ast.FunctionDef, ast.AsyncFunctionDef, ast.With)):
                walk_body(stmt.body)
            elif isinstance(stmt, ast.If):
                walk_body(stmt.body)

    walk_body(tree.body)

    for name, pos in df_order.items():
        if name in read_dfs and name not in written_dfs:
            df_type = "source"
        elif name in written_dfs:
            df_type = "sink"
        else:
            df_type = "intermediate"
        facts.dataframes.append(
            {
                "df_name": name,
                "df_type": df_type,
                "input_dfs": df_inputs.get(name, []),
                "order": pos,
            }
        )

    return {
        "script_name": script_name,
        "parse_ok": True,
        "assets": facts.assets,
        "dataframes": facts.dataframes,
        "columns": facts.columns,
        "temp_views": facts.temp_views,
        "sql_blocks": facts.sql_blocks,
    }


# ---------------------------------------------------------------------------
# Spark wrappers
# ---------------------------------------------------------------------------

def _extract_batches(batches):
    import pandas as pd

    cols = [f.name for f in FACTS_SCHEMA.fields]
    for pdf in batches:
        out = [
            extract_script_facts(name, src)
            for name, src in zip(pdf["script_name"], pdf["source"])
        ]
        yield pd.DataFrame(out, columns=cols)


def extract_facts(scripts: DataFrame) -> DataFrame:
    """scripts(script_name, source) -> one facts row per script.

    Arrow-batched `mapInPandas`, not a row-at-a-time `F.udf`: the per-script
    AST walk is pure Python either way, but batching moves rows over one
    Arrow stream per partition instead of a pickle round-trip per row —
    at repo-catalog scale (100k+ scripts) the serialization overhead is
    the difference, and it keeps the engine's "always Arrow-batched"
    contract uniform."""
    return scripts.mapInPandas(_extract_batches, schema=FACTS_SCHEMA)


def assets_table(facts: DataFrame) -> DataFrame:
    return facts.select(
        "script_name", F.explode("assets").alias("a")
    ).select("script_name", "a.*")


def dataframes_table(facts: DataFrame) -> DataFrame:
    return facts.select(
        "script_name", F.explode("dataframes").alias("d")
    ).select("script_name", "d.*")


def columns_table(facts: DataFrame) -> DataFrame:
    return facts.select(
        "script_name", F.explode("columns").alias("c")
    ).select("script_name", "c.*")


def temp_views_table(facts: DataFrame) -> DataFrame:
    return facts.select(
        "script_name", F.explode("temp_views").alias("v")
    ).select("script_name", "v.*")


def extract_from_dir(spark: SparkSession, scripts_dir: str) -> DataFrame:
    from ..sources.scripts import read_scripts_dir

    return extract_facts(read_scripts_dir(spark, scripts_dir))
