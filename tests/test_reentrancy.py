"""Re-entrancy: the side-effectful queries (catalog DDL, bucketed tables,
file sinks, streaming memory sinks) must return IDENTICAL results when
invoked twice in the same session.

This is the contract an external harness relies on: round-1 it skipped
these queries, and fixed catalog/sink names would have made a second
invocation collide or read stale state. Unique per-invocation names plus
lazy cleanup make each call independent; this test pins that.
"""

from __future__ import annotations

import pytest

from ai_metadata_lineage_pyspark_spark.registry import all_queries

_SIDE_EFFECTFUL = [
    "sql_ddl_external_table",
    "bucketed_join_colocated",
    "csv_roundtrip_ingest",
    "jsonl_roundtrip_ingest",
    "partitioned_write_pruned_read",
    "streaming_session_window",
    "streaming_event_counts",
    "streaming_user_stats",
    "streaming_click_attribution",
    "streaming_dedup_events",
    "orc_roundtrip_ingest",
    "streaming_replay_counts",
    "streaming_foreach_upsert",
    "lineage_json_sink_roundtrip",
    "script_source_datasource",
]


def _canon(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


@pytest.mark.parametrize("name", _SIDE_EFFECTFUL)
def test_second_invocation_matches_first(spark, sf_dir, name):
    fn = all_queries()[name].fn
    first = _canon(fn(spark, sf_dir))
    second = _canon(fn(spark, sf_dir))
    assert first == second
    assert len(first) > 0
