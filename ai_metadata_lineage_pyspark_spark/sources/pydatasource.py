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
    files: tuple


class LineageJsonWriter(DataSourceWriter):
    """Task-side: each partition writes one JSONL file per script_name it
    holds (the caller repartitions by script_name, so a script's rows are
    co-located and each file is written exactly once). Commit is the
    all-tasks-succeeded barrier: only then is _SUCCESS stamped, so readers
    gate on it exactly like Hadoop committers."""

    def __init__(self, options: dict):
        self.path = options["path"]

    def write(self, rows):
        handles: dict = {}
        n = 0
        for row in rows:
            d = row.asDict()
            script = d["script_name"]
            if script not in handles:
                handles[script] = open(
                    os.path.join(self.path, f"{script}.json"), "w", encoding="utf-8"
                )
            handles[script].write(json.dumps(d, sort_keys=True) + "\n")
            n += 1
        for h in handles.values():
            h.close()
        return _WroteFiles(n_rows=n, files=tuple(sorted(handles)))

    def commit(self, messages):
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            f.write(
                json.dumps(
                    {
                        "rows": sum(m.n_rows for m in messages),
                        "files": sorted(f for m in messages for f in m.files),
                    }
                )
            )

    def abort(self, messages):
        pass  # partial per-script files are overwritten by the next attempt


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
