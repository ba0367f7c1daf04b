"""Custom Python DataSource (PySpark 4 DataSource API) for the script
corpus: `spark.read.format("pyscripts")`.

The modern connector surface for sources Spark has no native reader for:
`DataSource` declares name/schema, `DataSourceReader.partitions()` plans
one InputPartition per script file (so reads parallelize across executors
exactly like a file-source split plan), and `read(partition)` yields rows
executor-side. Functionally equivalent to sources/scripts.read_scripts_dir
(the wholetext text source); registered and oracle-checked so the engine
demonstrably supports BOTH routes — the built-in source for plain files,
and the DataSource API for anything bespoke (an internal scripts catalog, a
git server, a metastore of notebook cells).

Scale note: partition planning happens on the driver (a directory listing);
each partition reads one file executor-side, so the source scales to
directories of any width. Files must be on storage every executor can reach
(local mode: the local FS; cluster: object storage / NFS), same contract as
every Spark file source.
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from ..registry import register

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests",
    "fixtures",
    "pipelines",
)


class ScriptPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class PyScriptsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.dir = options["path"]

    def partitions(self):  # one partition per file -> per-file parallelism
        return [ScriptPartition(str(p)) for p in sorted(Path(self.dir).glob("*.py"))]

    def read(self, partition: ScriptPartition):
        p = Path(partition.path)
        # UTF-8 best-effort mirrors the reference's read fallback
        # (static_extract.py:67-74) and the text source's behavior
        yield (p.stem, p.read_text(encoding="utf-8", errors="replace"))


class PyScriptsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "pyscripts"

    def schema(self) -> str:
        return "script_name string, source string"

    def reader(self, schema) -> PyScriptsReader:
        return PyScriptsReader(self.options)


def read_scripts_datasource(spark: SparkSession, scripts_dir: str) -> DataFrame:
    spark.dataSource.register(PyScriptsDataSource)
    return spark.read.format("pyscripts").option("path", scripts_dir).load()


@register(
    "script_source_datasource",
    oracle=f"""
    SELECT regexp_extract(filename, '([^/]+)\\.py$', 1) AS script_name,
           content AS source
    FROM read_text('{FIXTURE_DIR}/*.py')
    """,
)
def script_source_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 via the DataSource API: the fixture pipeline scripts read through
    the custom `pyscripts` connector, hash-checked against DuckDB's
    read_text over the same files (and thereby against the built-in
    wholetext route that feeds the lineage extractor)."""
    return read_scripts_datasource(spark, FIXTURE_DIR)


# ---------------------------------------------------------------------------
# Writer half: a per-script JSON sink mirroring the reference's outputs/
# layout (one <script>.json per pipeline, static_extract.py:319-320).
# ---------------------------------------------------------------------------

import itertools
import json
import shutil
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage

_RUN_IDS = itertools.count()

_SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".scratch",
)


@dataclass
class _WroteFiles(WriterCommitMessage):
    n_rows: int
    # (final_name, temp_path, n_rows) triples: tasks stage to attempt-unique
    # temp files; only the driver-side commit renames winners into place.
    # Per-file row counts let commit() total only the WINNING attempts —
    # a duplicate speculative attempt's rows must not inflate the manifest.
    files: tuple


class LineageJsonWriter(DataSourceWriter):
    """Task-side: each partition stages one JSONL file per script_name it
    holds (the caller repartitions by script_name, so a script's rows are
    co-located) under an attempt-unique temp name — two speculative /
    retried attempts of the same partition can never clobber each other's
    bytes. Commit is the all-tasks-succeeded barrier: the driver renames
    exactly one winning attempt per file into place, then stamps _SUCCESS,
    so readers gate on it exactly like Hadoop committers (v1 protocol:
    task attempt dir -> job commit rename)."""

    def __init__(self, options: dict):
        self.path = options["path"]

    def write(self, rows):
        attempt = uuid.uuid4().hex[:12]
        handles: dict = {}
        temps: dict = {}
        counts: dict = {}
        n = 0
        for row in rows:
            d = row.asDict()
            script = d["script_name"]
            if script not in handles:
                tmp = os.path.join(self.path, f"._tmp.{script}.json.{attempt}")
                temps[script] = tmp
                counts[script] = 0
                handles[script] = open(tmp, "w", encoding="utf-8")
            handles[script].write(json.dumps(d, sort_keys=True) + "\n")
            counts[script] += 1
            n += 1
        for h in handles.values():
            h.close()
        return _WroteFiles(
            n_rows=n,
            files=tuple((f"{s}.json", temps[s], counts[s]) for s in sorted(temps)),
        )

    def _sweep_orphans(self):
        # Attempts that died before returning a commit message leave temps
        # no message references; the commit/abort barrier guarantees no live
        # attempt still needs them, so sweep everything still dot-staged.
        for name in os.listdir(self.path):
            if name.startswith("._tmp."):
                try:
                    os.remove(os.path.join(self.path, name))
                except OSError:
                    pass

    def commit(self, messages):
        committed: dict = {}  # final_name -> rows from the winning attempt
        for m in messages:
            for final_name, tmp, rows in m.files:
                # one winner per final file; duplicate-attempt temps of an
                # already-committed file are dropped below (O(1) lookups —
                # a repo-catalog write can commit 100k+ per-script files)
                if final_name not in committed and os.path.exists(tmp):
                    os.replace(tmp, os.path.join(self.path, final_name))
                    committed[final_name] = rows
                elif os.path.exists(tmp):
                    os.remove(tmp)
        self._sweep_orphans()
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            f.write(
                json.dumps(
                    {
                        # only winners count: a retried partition's rows are
                        # on disk exactly once, so the manifest says so
                        "rows": sum(committed.values()),
                        "files": sorted(committed),
                    }
                )
            )

    def abort(self, messages):
        # drop every staged temp from attempts that did report in, then
        # sweep stray temps from dead attempts (unbounded leak otherwise)
        for m in messages:
            for _final, tmp, _rows in m.files:
                if os.path.exists(tmp):
                    os.remove(tmp)
        self._sweep_orphans()


class LineageJsonDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "lineage_json"

    def writer(self, schema, overwrite: bool) -> LineageJsonWriter:
        path = self.options["path"]
        if overwrite and os.path.isdir(path):
            shutil.rmtree(path)
        os.makedirs(path, exist_ok=True)
        return LineageJsonWriter(self.options)


def _edges_oracle() -> str:
    from ..lineage.queries import _EDGES_GOLDEN, _values_sql

    return _values_sql(
        _EDGES_GOLDEN, ["script_name", "df_name", "target_col", "src_df", "src_col"]
    )


@register("lineage_json_sink_roundtrip", oracle=_edges_oracle())
def lineage_json_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14 via the DataSource WRITER API: canonical lineage edges written
    through the custom `lineage_json` sink (one JSON file per script — the
    reference's outputs/ layout), then read back with the built-in JSON
    source and value-checked against the golden edge rows. Exercises the
    full task-write -> commit-message -> driver-commit protocol."""
    from ..lineage.extract import columns_table, dataframes_table
    from ..lineage.postprocess import edges_table
    from ..lineage.queries import _facts

    spark.dataSource.register(LineageJsonDataSource)
    facts = _facts(spark)
    edges = edges_table(columns_table(facts), dataframes_table(facts)).select(
        "script_name", "df_name", "target_col", "src_df", "src_col"
    )
    out = os.path.join(_SCRATCH, f"lineage_json_{next(_RUN_IDS)}_{uuid.uuid4().hex[:8]}")
    (
        edges.repartition("script_name")
        .write.format("lineage_json")
        .option("path", out)
        .mode("overwrite")
        .save()
    )
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    return spark.read.json(os.path.join(out, "*.json")).select(
        "script_name", "df_name", "target_col", "src_df", "src_col"
    )


# ---------------------------------------------------------------------------
# Streaming half: a custom DataSourceStreamReader replaying the events
# parquet in bounded micro-batches with real offset management.
# ---------------------------------------------------------------------------

from pyspark.sql.datasource import DataSourceStreamReader


class _RangePartition(InputPartition):
    def __init__(self, path: str, start: int, end: int):
        self.path, self.start, self.end = path, start, end


class EventsReplayStreamReader(DataSourceStreamReader):
    """Offset space = row index into the parquet file. The engine drives
    each micro-batch with the (lastCommitted, latestOffset()) range; under
    availableNow the whole file is one batch, and a live queue-backed
    source would instead advance latestOffset incrementally per trigger.
    Each batch range splits into `sliceParts` partitions read
    executor-side via pyarrow row-slicing. commit() is the ack hook (no-op
    for a static file; a queue source would trim acked rows)."""

    def __init__(self, options: dict):
        self.path = options["path"]
        self.slice_parts = int(options.get("sliceParts", "4"))
        # maxRowsPerBatch bounds each micro-batch's admission (the
        # maxFilesPerTrigger analogue for this row-offset source): unset ->
        # the whole file is one batch (availableNow parity path); set -> the
        # offset advances incrementally per trigger, so a continuous-trigger
        # query replays the file across REAL multiple micro-batches with
        # cross-batch state evolution (tests/test_streaming.py pins per-batch
        # parity against the batch prefix shadow).
        mrb = options.get("maxRowsPerBatch")
        self.max_rows = int(mrb) if mrb is not None else None
        self.pos = 0
        import pyarrow.parquet as pq

        self.total = pq.ParquetFile(self.path).metadata.num_rows

    def initialOffset(self) -> dict:
        return {"idx": 0}

    def latestOffset(self) -> dict:
        # a live source would poll upstream here; with a batch-size bound we
        # admit at most max_rows new rows per trigger (monotone even if the
        # engine probes latestOffset more than once per batch)
        if self.max_rows is None:
            return {"idx": self.total}
        self.pos = min(self.pos + self.max_rows, self.total)
        return {"idx": self.pos}

    def partitions(self, start: dict, end: dict):
        s, e = start["idx"], min(end["idx"], self.total)
        if e <= s:
            return []
        step = max(1, (e - s + self.slice_parts - 1) // self.slice_parts)
        return [
            _RangePartition(self.path, a, min(a + step, e)) for a in range(s, e, step)
        ]

    def read(self, partition: _RangePartition):
        import pyarrow as pa
        import pyarrow.parquet as pq

        # Row-range pushdown: only deserialize the row groups overlapping
        # [start, end) instead of materializing the whole file in every
        # partition — read amplification stays O(range), not O(file) ×
        # sliceParts. Row-group stats give each group's row offset for free.
        pf = pq.ParquetFile(partition.path)
        cols = ["event_id", "user_id", "event_type", "ts"]
        groups, first_row = [], None
        offset = 0
        for g in range(pf.metadata.num_row_groups):
            n = pf.metadata.row_group(g).num_rows
            if offset < partition.end and offset + n > partition.start:
                if first_row is None:
                    first_row = offset
                groups.append(g)
            offset += n
        if not groups:
            return
        t = pf.read_row_groups(groups, columns=cols)
        sl = t.slice(partition.start - first_row, partition.end - partition.start)
        # type-adaptive ts -> epoch micros (same contract as functions/io.py):
        # timestamp[us/ns] casts through int64; already-integer stays as-is
        ts = sl.column("ts")
        if pa.types.is_timestamp(ts.type):
            ts_us = ts.cast(pa.timestamp("us")).cast(pa.int64())
        else:
            ts_us = pa.compute.divide(ts.cast(pa.int64()), 1000)
        for eid, uid, etype, us in zip(
            sl.column("event_id").to_pylist(),
            sl.column("user_id").to_pylist(),
            sl.column("event_type").to_pylist(),
            ts_us.to_pylist(),
        ):
            yield (eid, uid, etype, us)

    def commit(self, end: dict) -> None:
        pass


class EventsReplayDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "events_replay"

    def schema(self) -> str:
        return "event_id long, user_id long, event_type string, ts_us long"

    def streamReader(self, schema) -> EventsReplayStreamReader:
        return EventsReplayStreamReader(self.options)


@register(
    "streaming_replay_counts",
    oracle="""
    SELECT event_type, COUNT(*) AS events,
      CAST(SUM(user_id) AS BIGINT) AS sum_user_ids
    FROM events
    GROUP BY event_type
    """,
)
def streaming_replay_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type event counts read through the custom streaming source in
    complete output mode: whatever micro-batch boundaries the offset
    manager chooses, the final aggregate state must equal the batch answer
    (the oracle). Exercises initialOffset/latestOffset/partitions/read —
    the full Python streaming-source protocol."""
    from ..streaming.sessions import run_to_memory

    spark.dataSource.register(EventsReplayDataSource)
    stream = (
        spark.readStream.format("events_replay")
        .option("path", f"{sf_dir}/events.parquet")
        .load()
    )
    # streaming aggs forbid exact COUNT(DISTINCT); SUM is decomposable
    # across micro-batches and still proves every row arrived exactly once
    counts = stream.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("events"),
        F.sum("user_id").alias("sum_user_ids"),
    )
    return run_to_memory(counts, "complete")
