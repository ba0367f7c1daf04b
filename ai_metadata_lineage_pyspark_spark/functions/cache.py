"""Scoped persist bookkeeping.

A query function that `.persist()`s an intermediate cannot unpersist it
before returning — the returned DataFrame is lazy and still reads the
cached partitions when the caller finally collects. But a bare persist
leaks: under a long-lived session that invokes many queries (an external
harness, a bench loop) MEMORY_AND_DISK blocks accumulate unboundedly.

Contract: every persist in query code goes through `scoped_persist`, and
every query that uses it calls `release_persisted()` FIRST — so at any
moment at most one query's intermediates are cached, and a caller that
wants a completely clean session (tests assert this) calls
`release_persisted()` after its terminal action.

`spark.catalog.clearCache()` is NOT a substitute: it clears the persist
flag on every live DataFrame, so a later re-collect of a still-referenced
upstream DF silently recomputes instead of re-caching.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PERSISTED: list[DataFrame] = []


def scoped_persist(df: DataFrame) -> DataFrame:
    """persist() with registration so a later caller can release it."""
    _PERSISTED.append(df.persist())
    return df


def release_persisted() -> None:
    """Unpersist every DataFrame registered via scoped_persist."""
    while _PERSISTED:
        _PERSISTED.pop().unpersist()
