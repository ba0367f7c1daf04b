"""Physical-plan inspection helpers.

The scale contract of this engine ("filters reach the scan, dims broadcast,
aggregation is partial, no accidental cartesian blow-ups") is asserted in
tests/test_plans.py with these helpers, so a plan regression fails CI
instead of surfacing as a 100 TB incident. They parse the executed plan's
string form — the same thing `df.explain("formatted")` prints — which is
stable enough for presence checks.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """Executed (AQE-final-ish initial) physical plan as a string."""
    return df._jdf.queryExecution().executedPlan().toString()


def operators(df: DataFrame) -> list[str]:
    """Operator names appearing in the physical plan, outermost first."""
    names = re.findall(r"^[\s:+*()-]*(\w[\w.]*)", physical_plan(df), re.M)
    return [n for n in names if n]


def has_operator(df: DataFrame, name: str) -> bool:
    return any(name == op or op.startswith(name) for op in operators(df))


def broadcast_join_count(df: DataFrame) -> int:
    return physical_plan(df).count("BroadcastHashJoin")


def sort_merge_join_count(df: DataFrame) -> int:
    return physical_plan(df).count("SortMergeJoin")


def cartesian_product_count(df: DataFrame) -> int:
    """CartesianProduct operators (unbounded all-pairs shuffles). A
    BroadcastNestedLoopJoin against a deliberately-broadcast tiny side is
    NOT counted — that's the intended shape for small non-equi joins."""
    return physical_plan(df).count("CartesianProduct")


def pushed_filters(df: DataFrame) -> list[str]:
    """All parquet-pushed filter lists, flattened (from `PushedFilters: [...]`)."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", physical_plan(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def scan_columns(df: DataFrame) -> list[list[str]]:
    """Columns actually read by each parquet scan, from the FileScan's
    column list (`FileScan parquet [c1#id,c2#id,...]` — printed in full,
    unlike ReadSchema which the plan printer may truncate).

    The judge of a 100 TB scan is this list: a projection of 2 columns that
    reads 12 is a plan bug even when results are correct.
    """
    out: list[list[str]] = []
    for m in re.finditer(r"FileScan \w+ \[([^\]]*)\]", physical_plan(df)):
        cols = [
            c.strip().split("#")[0]
            for c in m.group(1).split(",")
            if c.strip()
        ]
        out.append(cols)
    return out


def equi_join_key_sets(df: DataFrame) -> list[list[str]]:
    """Key column names of each equi-join (SortMergeJoin / ShuffledHashJoin /
    BroadcastHashJoin) in the plan, one list per join side-pair. Lets a test
    assert a candidate join is keyed on a bucket column — i.e. genuinely
    bucketed candidate generation, not an all-pairs join with a filter."""
    out: list[list[str]] = []
    for m in re.finditer(
        r"(?:SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)\w* \[([^\]]*)\], \[([^\]]*)\]",
        physical_plan(df),
    ):
        keys = [
            k.strip().split("#")[0]
            for side in (m.group(1), m.group(2))
            for k in side.split(",")
            if k.strip()
        ]
        out.append(keys)
    return out


def shuffle_exchange_count(df: DataFrame) -> int:
    """Shuffle exchanges in the plan ('Exchange hashpartitioning/range...' —
    excludes broadcast exchanges, which move only tiny sides)."""
    return len(re.findall(r"Exchange (?!SinglePartition)\w*partitioning", physical_plan(df)))


def partial_aggregate_count(df: DataFrame) -> int:
    """Number of map-side partial aggregates (functions=[partial_...]).

    Counts SortAggregate as well as HashAggregate: Spark falls back to
    sort-based aggregation when an aggregate's buffer isn't mutable
    fixed-width (e.g. max_by carrying a string), but the map-side combine —
    the property that bounds shuffle volume to one row per group — is the
    same in both forms.
    """
    return len(re.findall(r"(?:Hash|Sort)Aggregate\([^)]*partial_", physical_plan(df)))


def wholestage_codegen_count(df: DataFrame) -> int:
    """Distinct whole-stage-codegen spans: `*(n)` operator prefixes in the
    compact rendering, `WholeStageCodegen (n)` in the tree rendering."""
    plan = physical_plan(df)
    if "isFinalPlan=false" in plan:
        # AQE renders codegen spans only in the finalized plan — execute to
        # let it finish re-planning (cheap at test scale factors)
        df.collect()
        plan = physical_plan(df)
    ids = set(re.findall(r"\*\((\d+)\)", plan))
    ids |= set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
    return len(ids)
