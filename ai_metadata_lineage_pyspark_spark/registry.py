"""Query registry: maps a query name to (spark callable, oracle SQL).

Every operator the engine claims is registered here; __spark_entry__.py's
``queries()`` / ``oracle_sql()`` are thin views over this registry, and
bench.py times a subset of it.

A registered spark callable has signature ``(spark, sf_dir) -> DataFrame``.
``oracle`` is the equivalent ANSI SQL for DuckDB over the same parquet
tables (views: region nation customer supplier part orders lineitem events
documents embeddings), or None for ops that are not SQL-expressible (the
driver then records a weaker rows-only check).

Column-naming contract: the driver sorts columns by name before hashing, so
the Spark result and the oracle must use identical column names — alias
everything on both sides. Floating-point outputs are rounded on BOTH sides
(well away from representation noise) so value hashes are stable across
engines.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class RegisteredQuery:
    name: str
    fn: SparkQuery
    oracle: str | None
    bench: bool = False  # include in bench.py headline timings
    # Largest scale factor this query is CONTRACTED to run at, or None for
    # unbounded. A non-None value formally demotes the query to a bounded
    # ground-truth harness (e.g. an exact-quadratic baseline whose true
    # output is itself quadratic in the corpus): sweep tooling skips it —
    # with an explicit SKIP line, never silently — at any larger scale.
    max_sf: float | None = None


_REGISTRY: dict[str, RegisteredQuery] = {}


def register(
    name: str,
    oracle: str | None = None,
    bench: bool = False,
    max_sf: float | None = None,
):
    def deco(fn: SparkQuery) -> SparkQuery:
        _REGISTRY[name] = RegisteredQuery(
            name=name, fn=fn, oracle=oracle, bench=bench, max_sf=max_sf
        )
        return fn

    return deco


def all_queries() -> dict[str, RegisteredQuery]:
    _ensure_loaded()
    return dict(_REGISTRY)


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from .operators import (  # noqa: F401
        behavior,
        chunking,
        cogrouped,
        curation,
        decontam,
        dedup,
        graph,
        hygiene,
        merge,
        mining,
        multimodal,
        profile,
        quality,
        relational,
        rollup,
        sampling,
        search,
        setops,
        similarity,
        sketch,
        skew,
        temporal,
        text,
        tpch,
        tpch_suite,
        udtfs,
        windows,
    )
    from .lineage import queries as lineage_queries  # noqa: F401
    from .sources import pydatasource  # noqa: F401
    from .sources import sinks  # noqa: F401
    from .streaming import gates as streaming_gates  # noqa: F401
    from .streaming import joins as streaming_joins  # noqa: F401
    from .streaming import sessions  # noqa: F401
    from .streaming import upsert as streaming_upsert  # noqa: F401

    _LOADED = True
