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
