"""Protocol-level unit tests for the custom Python DataSource halves added
in sources/pydatasource.py — exercised directly (no Spark job) so the
commit/abort and offset-range contracts are pinned at the class level:

- LineageJsonWriter: task attempts stage to attempt-unique temp files; the
  driver-side commit renames exactly one winner per final file and drops
  duplicate-attempt temps (speculative execution / task retry); abort
  removes staged temps without touching committed files.
- EventsReplayStreamReader.read(): the row-range pushdown must deserialize
  only row groups overlapping [start, end) and return exactly the rows of
  the range, across row-group boundaries.
"""

from __future__ import annotations

import json
import os
from types import SimpleNamespace

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ai_metadata_lineage_pyspark_spark.sources.pydatasource import (
    EventsReplayStreamReader,
    LineageJsonWriter,
    _RangePartition,
)


class _Row(SimpleNamespace):
    def asDict(self):
        return dict(self.__dict__)


def _write_rows(writer, rows):
    return writer.write(iter(_Row(**r) for r in rows))


def test_writer_stages_temps_and_commit_renames_one_winner(tmp_path):
    out = str(tmp_path)
    w = LineageJsonWriter({"path": out})
    msg1 = _write_rows(
        w,
        [
            {"script_name": "s1", "edge": "a"},
            {"script_name": "s1", "edge": "b"},
            {"script_name": "s2", "edge": "c"},
        ],
    )
    # a second (speculative) attempt of the same partition
    msg2 = _write_rows(w, [{"script_name": "s1", "edge": "a"}])
    # before commit: only dot-prefixed temps exist, invisible to *.json globs
    assert all(f.startswith("._tmp.") for f in os.listdir(out))
    w.commit([msg1, msg2])
    files = sorted(os.listdir(out))
    assert files == ["_SUCCESS", "s1.json", "s2.json"]  # no stray temps
    # the winner is the first message's attempt (two rows), not the retry's
    lines = open(os.path.join(out, "s1.json")).read().splitlines()
    assert len(lines) == 2
    success = json.loads(open(os.path.join(out, "_SUCCESS")).read())
    assert sorted(success["files"]) == ["s1.json", "s2.json"]
    # the manifest counts only the WINNING attempts' rows: 2 (s1 from msg1)
    # + 1 (s2 from msg1); the speculative retry's 1 row is not double-counted
    assert success["rows"] == 3


def test_writer_commit_sweeps_orphaned_temps(tmp_path):
    # an attempt that dies before reporting leaves a temp no message
    # references; commit() must sweep it after the barrier
    out = str(tmp_path)
    w = LineageJsonWriter({"path": out})
    msg = _write_rows(w, [{"script_name": "s1", "edge": "a"}])
    orphan = os.path.join(out, "._tmp.s9.json.deadbeef0000")
    open(orphan, "w").write("{}\n")
    w.commit([msg])
    assert sorted(os.listdir(out)) == ["_SUCCESS", "s1.json"]


def test_writer_abort_removes_staged_temps(tmp_path):
    out = str(tmp_path)
    w = LineageJsonWriter({"path": out})
    msg = _write_rows(w, [{"script_name": "s1", "edge": "a"}])
    orphan = os.path.join(out, "._tmp.s9.json.deadbeef0000")
    open(orphan, "w").write("{}\n")
    w.abort([msg])
    assert os.listdir(out) == []


@pytest.fixture()
def multi_group_events(tmp_path):
    # 25 rows in row groups of 10/10/5 — ranges must cross group boundaries
    n = 25
    t = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "user_id": pa.array([i * 7 for i in range(n)], pa.int64()),
            "event_type": pa.array([f"t{i % 3}" for i in range(n)]),
            "ts": pa.array(
                [1_700_000_000_000_000 + i * 1_000_000 for i in range(n)],
                pa.timestamp("us"),
            ),
        }
    )
    path = str(tmp_path / "events.parquet")
    pq.write_table(t, path, row_group_size=10)
    assert pq.ParquetFile(path).metadata.num_row_groups == 3
    return path


def test_stream_read_range_pushdown_only_overlapping_groups(multi_group_events):
    reader = EventsReplayStreamReader({"path": multi_group_events, "sliceParts": "4"})
    assert reader.total == 25

    # range inside one group
    rows = list(reader.read(_RangePartition(multi_group_events, 3, 7)))
    assert [r[0] for r in rows] == [3, 4, 5, 6]

    # range crossing the 10-row group boundary
    rows = list(reader.read(_RangePartition(multi_group_events, 8, 13)))
    assert [r[0] for r in rows] == [8, 9, 10, 11, 12]

    # range covering the tail group exactly
    rows = list(reader.read(_RangePartition(multi_group_events, 20, 25)))
    assert [r[0] for r in rows] == [20, 21, 22, 23, 24]

    # empty range yields nothing
    assert list(reader.read(_RangePartition(multi_group_events, 7, 7))) == []

    # the planner's partitions() cover the whole offset space disjointly
    parts = reader.partitions({"idx": 0}, {"idx": 25})
    covered = sorted((p.start, p.end) for p in parts)
    assert covered[0][0] == 0 and covered[-1][1] == 25
    assert all(a[1] == b[0] for a, b in zip(covered, covered[1:]))
    # and reading every partition reproduces every row exactly once
    all_ids = [r[0] for p in parts for r in reader.read(p)]
    assert sorted(all_ids) == list(range(25))


def test_stream_read_ts_epoch_contract(multi_group_events):
    reader = EventsReplayStreamReader({"path": multi_group_events, "sliceParts": "1"})
    rows = list(reader.read(_RangePartition(multi_group_events, 0, 2)))
    # timestamp[us] column -> epoch micros passthrough
    assert rows[0][3] == 1_700_000_000_000_000
    assert rows[1][3] == 1_700_000_001_000_000
