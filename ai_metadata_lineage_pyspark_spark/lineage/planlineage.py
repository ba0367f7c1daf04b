"""Plan-based column lineage: lineage read from Spark's analyzed logical plan.

The AST path (lineage/extract.py) is the static, no-execution twin of the
reference's extractor (reference extractor/static_extract.py). This module
implements the Spark-native opportunity named in SURVEY.md §4 that the
reference — a pure source-text tool — structurally cannot have: for
*executable* pipelines, run them against schema-only stand-in inputs under a
read/write-capturing session shim and derive column lineage from the
analyzed logical plan (`df._jdf.queryExecution().analyzed()`). Analysis
binds every output attribute to concrete input attributes by exprId, so the
plan resolves exactly the cases static AST matching misses or approximates:

- expression join conditions and positional `how` arguments (reference
  static_extract.py:231-248, quirk A11 — recovered only by the reference's
  LLM layer);
- SQL blocks and CTE chains (`spark.sql(...)` over temp views, reference
  examples script_04/script_06/script_10) — invisible to the Python AST;
- aliases, star-expansion, drops, and qualified-column resolution.

Execution model / scale shape: plan derivation is inherently DRIVER-side
work on metadata — each pipeline runs against EMPTY stand-in inputs
(`createDataFrame([], schema)`), so "running" a script costs analysis only,
never an action on data. Per-script cost is constant (a few ms of Catalyst
analysis); a 100k-script repo parallelizes across scripts (a job farm or
`mapInPandas` over script paths, exactly like the AST extractor), not
within one plan. The edge tables this produces are metadata-sized and feed
the same stitch/closure/corpus operators as the AST path.

Write capture monkey-patches `DataFrameWriter` save methods for the
duration of a run: each captured write registers a FRESH leaf DataFrame
with the written schema, so a downstream script reading that path gets a
clean analysis boundary and each script's plan contains only its own
operators.

Known boundary: scripts needing engine features absent from the sandbox
(Delta Lake — reference script_08/script_09) raise during execution and
are reported in the `skipped` list rather than silently dropped; their
facts remain covered by the AST path.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession


def _norm(path: str | None) -> str | None:
    return path.rstrip("/") if isinstance(path, str) else path


def _seq(s) -> list:
    return [s.apply(i) for i in range(s.size())]


# ---------------------------------------------------------------------------
# session shim: reads resolve to schema-only stand-ins, writes are captured
# ---------------------------------------------------------------------------


class _ShimReader:
    """Duck-typed DataFrameReader: options are accepted and ignored (the
    stand-ins are schema-only), terminal calls resolve the path."""

    def __init__(self, shim: "PlanCaptureSession") -> None:
        self._shim = shim

    def option(self, *_args, **_kw) -> "_ShimReader":
        return self

    def options(self, **_kw) -> "_ShimReader":
        return self

    def schema(self, *_args) -> "_ShimReader":
        return self

    def format(self, *_args) -> "_ShimReader":
        return self

    def parquet(self, path: str, *_a, **_kw) -> DataFrame:
        return self._shim._input(path)

    def csv(self, path: str, *_a, **_kw) -> DataFrame:
        return self._shim._input(path)

    def json(self, path: str, *_a, **_kw) -> DataFrame:
        return self._shim._input(path)

    def orc(self, path: str, *_a, **_kw) -> DataFrame:
        return self._shim._input(path)

    def load(self, path: str | None = None, **_kw) -> DataFrame:
        return self._shim._input(path)

    def table(self, name: str) -> DataFrame:
        return self._shim.table(name)


class PlanCaptureSession:
    """Duck-typed SparkSession handed to pipeline `run(spark)`/`main(spark)`
    functions. `.read` resolves paths to empty stand-in DataFrames (seeded
    schemas for raw inputs, captured schemas for upstream writes); `sql`,
    `table`, `createDataFrame` and everything else delegate to the real
    session, so temp views registered by the script work natively."""

    def __init__(self, spark: SparkSession, seed_schemas: dict[str, str]) -> None:
        self._spark = spark
        self._seeds = {_norm(k): v for k, v in seed_schemas.items()}
        self.frames: dict[str, DataFrame] = {}
        self.reads: set[str] = set()

    @property
    def read(self) -> _ShimReader:
        return _ShimReader(self)

    def sql(self, query: str, **kw) -> DataFrame:
        return self._spark.sql(query, **kw)

    def table(self, name: str) -> DataFrame:
        # seeded/captured names win; otherwise fall back to the REAL session
        # for temp views the script itself registered (r7 advice: a script
        # doing createOrReplaceTempView + spark.table(view) previously hit
        # the seed-schema KeyError and was reported skipped, silently losing
        # its lineage, while the equivalent spark.sql('... FROM view')
        # path worked)
        p = _norm(name)
        if p not in self.frames and p not in self._seeds:
            try:
                if self._spark.catalog.tableExists(name):
                    return self._spark.table(name)
            except Exception:  # noqa: BLE001 — fall through to the seed error
                pass
        return self._input(name)

    def createDataFrame(self, *a, **kw) -> DataFrame:
        return self._spark.createDataFrame(*a, **kw)

    def __getattr__(self, name: str):
        return getattr(self._spark, name)

    def _input(self, path: str) -> DataFrame:
        p = _norm(path)
        if p not in self.frames:
            if p not in self._seeds:
                raise KeyError(
                    f"plan lineage: no seed schema or captured upstream write"
                    f" for input {path!r}"
                )
            self.frames[p] = self._spark.createDataFrame([], self._seeds[p])
        self.reads.add(p)
        return self.frames[p]

    def _register_write(self, path: str, df: DataFrame) -> None:
        # fresh leaf with the written schema: downstream plans must not
        # inline this script's operators
        self.frames[_norm(path)] = self._spark.createDataFrame([], df.schema)


class _V2Recorder:
    """Stand-in for DataFrameWriterV2 (df.writeTo(table)): builder calls
    chain, terminal calls record (table, df) and skip the physical write
    (r7 advice: V2 writes previously vanished without appearing in
    `skipped`)."""

    def __init__(self, df: DataFrame, table: str, writes: list) -> None:
        self._df, self._table, self._writes = df, table, writes

    def using(self, *_a) -> "_V2Recorder":
        return self

    def option(self, *_a, **_kw) -> "_V2Recorder":
        return self

    def options(self, **_kw) -> "_V2Recorder":
        return self

    def tableProperty(self, *_a) -> "_V2Recorder":
        return self

    def partitionedBy(self, *_a) -> "_V2Recorder":
        return self

    def _record(self) -> None:
        self._writes.append((self._table, self._df))

    create = createOrReplace = replace = append = overwrite = (
        lambda self, *_a, **_kw: self._record()
    )
    overwritePartitions = lambda self, *_a, **_kw: self._record()  # noqa: E731


@contextmanager
def _capture_writes(writer_cls: type, writes: list[tuple[str, DataFrame]], df_cls: type = DataFrame):
    """Patch DataFrameWriter terminal methods to record (path, df) and skip
    the physical write; `option('path', ...)` is recorded so a bare
    `.save()` resolves its sink instead of recording '' (r7 advice).
    `DataFrame.writeTo` is patched to a V2 recorder. foreachBatch-style
    streaming sinks are NOT captured — out of scope for batch pipeline
    lineage (the streaming twin would hook DataStreamWriter). Restores the
    classes on exit."""

    def _mk(name: str):
        def patched(self, path=None, *_a, **_kw):
            if path is None:
                path = getattr(self, "_plan_lineage_opts", {}).get("path")
            writes.append((path, self._df))

        patched.__name__ = name
        return patched

    def _opt(self, key=None, value=None):
        if key is not None:
            self.__dict__.setdefault("_plan_lineage_opts", {})[str(key)] = value
        return self

    def _opts(self, **kw):
        self.__dict__.setdefault("_plan_lineage_opts", {}).update(
            {str(k): v for k, v in kw.items()}
        )
        return self

    names = ("parquet", "csv", "json", "orc", "text", "save", "saveAsTable", "insertInto")
    originals = {n: getattr(writer_cls, n) for n in names}
    orig_option = writer_cls.option
    orig_options = writer_cls.options
    # patch the CONCRETE DataFrame class (pyspark.sql.classic in Spark 4
    # overrides the base's writeTo, so patching the ABC would be a no-op)
    orig_write_to = df_cls.writeTo
    try:
        for n in names:
            setattr(writer_cls, n, _mk(n))
        writer_cls.option = _opt
        writer_cls.options = _opts
        df_cls.writeTo = lambda self, table: _V2Recorder(self, table, writes)
        yield
    finally:
        for n, fn in originals.items():
            setattr(writer_cls, n, fn)
        writer_cls.option = orig_option
        writer_cls.options = orig_options
        df_cls.writeTo = orig_write_to


# ---------------------------------------------------------------------------
# analyzed-plan lineage maps
# ---------------------------------------------------------------------------


def _output_attrs(df: DataFrame) -> list[tuple[str, int]]:
    """(name, exprId) of the analyzed plan's output attributes."""
    return [
        (a.name(), a.exprId().id())
        for a in _seq(df._jdf.queryExecution().analyzed().output())
    ]


def _collect_lineage_maps(plan) -> tuple[dict[int, set[tuple[str, int]]], list[set[tuple[str, int]]]]:
    """Walk the analyzed logical plan once.

    Returns (alias_map, join_condition_refs): alias_map binds each Alias's
    exprId to the (name, exprId) attribute references of its child tree
    (Alias is the single binding construct of resolved plans — Project,
    Aggregate and Window all express derivations through it); Union output
    attributes are bound positionally to each child's attributes, and
    CTERelationRef outputs positionally to their CTERelationDef's outputs
    (SQL `WITH` chains mint fresh exprIds at each reference site). Every
    Join node's condition contributes one reference set for the `__join__`
    pseudo-edges (quirk A11: the analyzer has already resolved expression
    conditions, USING joins and positional `how` into the same shape).
    """
    alias_map: dict[int, set[tuple[str, int]]] = {}
    join_refs: list[set[tuple[str, int]]] = []
    cte_defs: dict[int, list[tuple[str, int]]] = {}
    cte_refs: list[tuple[int, list[tuple[str, int]]]] = []

    def refs_of(expr) -> set[tuple[str, int]]:
        return {
            (r.name(), r.exprId().id()) for r in _seq(expr.references().toSeq())
        }

    def walk(node) -> None:
        kind = node.getClass().getSimpleName()
        for e in _seq(node.expressions()):
            if e.getClass().getSimpleName() == "Alias":
                alias_map.setdefault(e.exprId().id(), set()).update(refs_of(e))
        if kind == "Join":
            cond = node.condition()
            if cond.isDefined():
                join_refs.append(refs_of(cond.get()))
        elif kind == "Union":
            outs = _seq(node.output())
            children = _seq(node.children())
            for i, attr in enumerate(outs):
                bound = alias_map.setdefault(attr.exprId().id(), set())
                for child in children:
                    couts = _seq(child.output())
                    if i < len(couts):
                        bound.add((couts[i].name(), couts[i].exprId().id()))
        elif kind == "Generate":
            # explode/posexplode/inline: the generator's output attrs carry
            # fresh exprIds with no Alias binding — bind them to the
            # generator expression's references so traced lineage flows
            # through instead of dead-ending (r7 advice)
            grefs = refs_of(node.generator())
            for attr in _seq(node.generatorOutput()):
                alias_map.setdefault(attr.exprId().id(), set()).update(grefs)
        elif kind == "CTERelationDef":
            cte_defs[node.id()] = [
                (a.name(), a.exprId().id()) for a in _seq(node.output())
            ]
        elif kind == "CTERelationRef":
            cte_refs.append(
                (
                    node.cteId(),
                    [(a.name(), a.exprId().id()) for a in _seq(node.output())],
                )
            )
        for child in _seq(node.children()):
            walk(child)

    walk(plan)
    # bind each CTE reference's (possibly re-minted) output attrs to the
    # defining plan's outputs positionally; a ref that kept the def's
    # exprIds just gains self-edges the tracer's seen-set ignores
    for cte_id, ref_attrs in cte_refs:
        def_attrs = cte_defs.get(cte_id, [])
        for i, (_name, rid) in enumerate(ref_attrs):
            if i < len(def_attrs):
                alias_map.setdefault(rid, set()).add(def_attrs[i])
    return alias_map, join_refs


def _trace(
    start: int,
    alias_map: dict[int, set[tuple[str, int]]],
    boundary: dict[int, tuple[str, str]],
) -> set[tuple[str, str]]:
    """Resolve one exprId to the set of (input_path, column) it derives
    from, expanding through aliases and stopping at input boundaries."""
    found: set[tuple[str, str]] = set()
    seen: set[int] = set()
    stack = [start]
    while stack:
        i = stack.pop()
        if i in seen:
            continue
        seen.add(i)
        if i in boundary:
            found.add(boundary[i])
            # do NOT stop here: Union reuses its FIRST child's exprIds as
            # the union output, so an id can be an input boundary attr of
            # child A *and* carry alias bindings to every other child's
            # attrs — stopping at the boundary silently dropped lineage to
            # all non-first Union children (r7 advice). Self-loops are
            # impossible: the seen-set never revisits an id.
        for _name, rid in alias_map.get(i, ()):
            stack.append(rid)
    return found


def sink_edges(
    script_name: str,
    sink_path: str,
    df: DataFrame,
    boundary: dict[int, tuple[str, str]],
) -> set[tuple[str, str, str, str, str]]:
    """(script, sink, out_col, src, src_col) edges for one captured write:
    one row per (output column × contributing input column), plus
    `__join__` pseudo-rows for every join-condition reference — the same
    pseudo-column convention the AST path uses for join keys."""
    plan = df._jdf.queryExecution().analyzed()
    alias_map, join_refs = _collect_lineage_maps(plan)
    edges: set[tuple[str, str, str, str, str]] = set()
    for attr in _seq(plan.output()):
        for src, src_col in _trace(attr.exprId().id(), alias_map, boundary):
            edges.add((script_name, sink_path, attr.name(), src, src_col))
    for refs in join_refs:
        for _name, rid in refs:
            for src, src_col in _trace(rid, alias_map, boundary):
                edges.add((script_name, sink_path, "__join__", src, src_col))
    return edges


# ---------------------------------------------------------------------------
# pipeline runner
# ---------------------------------------------------------------------------


def run_pipelines(
    spark: SparkSession,
    script_paths: list[str],
    seed_schemas: dict[str, str],
) -> tuple[list[tuple[str, str, str, str, str]], list[tuple[str, str]]]:
    """Execute pipeline scripts in order under the capture shim and derive
    plan lineage for every write each script performs.

    Scripts may define `run(spark)` or `main(spark)` (called with the
    shim), or be module-level straight-line code referencing a global
    `spark` (reference examples script_a/script_b shape). Returns
    (edges, skipped) where skipped is [(script, reason)] for scripts whose
    execution raised (e.g. the Delta-dependent reference script_08/09 in
    this sandbox).

    TRUST BOUNDARY — this function exec()s the scripts IN-PROCESS with
    full privileges. That is inherent to plan lineage (the script must
    build real DataFrame plans against the shim session), and it means
    the caller must treat every script path as CODE IT CHOOSES TO RUN,
    exactly as a scheduler does: only feed scripts from a source you
    would deploy. For corpora not under the caller's control, pin
    content by hash before invoking (tests/test_plan_lineage.py pins the
    public reference examples this way) or run the whole derivation in a
    disposable subprocess/container. The AST path (lineage/extract.py)
    is the no-execution alternative for untrusted source.
    """
    shim = PlanCaptureSession(spark, seed_schemas)
    probe = spark.range(1)
    writer_cls = type(probe.write)
    df_cls = type(probe)
    edges: list[tuple[str, str, str, str, str]] = []
    skipped: list[tuple[str, str]] = []
    for path in script_paths:
        name = os.path.splitext(os.path.basename(path))[0]
        with open(path, encoding="utf-8") as fh:
            source = fh.read()
        shim.reads = set()
        writes: list[tuple[str, DataFrame]] = []
        try:
            with _capture_writes(writer_cls, writes, df_cls):
                glb = {"__name__": "__plan_lineage_twin__", "spark": shim}
                exec(compile(source, path, "exec"), glb)  # noqa: S102
                entry = glb.get("run") or glb.get("main")
                if callable(entry):
                    entry(shim)
        except Exception as exc:  # noqa: BLE001 — report, don't abort the repo scan
            skipped.append((name, f"{type(exc).__name__}: {exc}"))
            continue
        boundary: dict[int, tuple[str, str]] = {}
        for p in shim.reads:
            for col, expr_id in _output_attrs(shim.frames[p]):
                boundary[expr_id] = (p, col)
        for wpath, wdf in writes:
            edges.extend(sink_edges(name, _norm(wpath) or "", wdf, boundary))
            shim._register_write(wpath, wdf)
    return sorted(set(edges)), skipped


# seed schemas for the repo's own fixture pipelines
# (tests/fixtures/pipelines/p01..p06): only the two raw inputs need seeds;
# every other read is an upstream fixture write captured in-run
FIXTURE_SEEDS: dict[str, str] = {
    "s3a://fleet-lake/raw/readings/": (
        "device_id string, reading_ts string, temp_c string, site string"
    ),
    "s3a://fleet-lake/raw/device_registry/": (
        "device_id string, updated_at timestamp, contract_value double, site_uri string"
    ),
}
