"""Source/sink round-trips: CSV ingest, partitioned parquet writes with
partition pruning, and SQL DDL over an external location.

Covers the §2B scan/sink rows the pure-read queries can't: CSV read with
header+inferSchema (script_01:6-9), partitionBy writes (script_01:25-27,
script_03:35, script_05:29, script_06:41, script_07:38 — 1- and 2-key), and
`CREATE TABLE ... USING ... LOCATION` (script_09:9-13). Delta sinks
(script_08/09) are import-gated in operators/merge.py; the parquet DDL here
is the catalog-equivalent surface available in this environment.

Each query writes into a git-ignored scratch dir under the repo (overwrite
mode — idempotent per run) and reads its own output back, so the oracle
can be phrased over the original fixture tables: a round-trip that loses or
mangles rows fails the value-hash.

Scale notes: partitionBy on a low-cardinality key is the canonical layout
for partition-pruned scans; the read-back filter compiles to a pruned scan
(PartitionFilters in .explain), not a full read. CSV inference samples the
file once — at 100 TB you pin an explicit schema instead (both paths shown).
"""

from __future__ import annotations

import itertools
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.io import load
from ..registry import register

_SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".scratch",
)


def _scratch(name: str) -> str:
    os.makedirs(_SCRATCH, exist_ok=True)
    return os.path.join(_SCRATCH, name)


def _sweep_stale(parent: str, prefixes: tuple[str, ...], max_age_s: int = 3600) -> None:
    """Remove per-invocation output dirs left by PREVIOUS processes (the
    lazy in-process drop can't see them). Age-gated so a concurrently
    running harness process is never raced."""
    import shutil
    import time

    if not os.path.isdir(parent):
        return
    cutoff = time.time() - max_age_s
    for entry in os.listdir(parent):
        if entry.startswith(prefixes):
            path = os.path.join(parent, entry)
            try:
                if os.path.getmtime(path) < cutoff:
                    shutil.rmtree(path, ignore_errors=True)
            except OSError:
                pass


@register(
    "csv_roundtrip_ingest",
    oracle="""
    SELECT r.r_regionkey, r.r_name, n.n_name,
      CAST(length(n.n_name) AS INT) AS name_len
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    """,
)
def csv_roundtrip_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink + source with header and schema inference (script_01:6-9
    shape): write region+nation out as CSV, read back inferring int keys,
    then join — proving the ingest path preserves types and values."""
    out = _scratch("csv_region_nation")
    region = load(spark, sf_dir, "region")
    nation = load(spark, sf_dir, "nation")
    region.write.mode("overwrite").option("header", "true").csv(f"{out}/region")
    nation.write.mode("overwrite").option("header", "true").csv(f"{out}/nation")
    r = spark.read.option("header", "true").option("inferSchema", "true").csv(f"{out}/region")
    n = spark.read.option("header", "true").option("inferSchema", "true").csv(f"{out}/nation")
    return (
        r.alias("r")
        .join(n.alias("n"), F.col("n.n_regionkey") == F.col("r.r_regionkey"))
        .select(
            "r.r_regionkey",
            "r.r_name",
            "n.n_name",
            F.length("n.n_name").cast("int").alias("name_len"),
        )
    )


@register(
    "partitioned_write_pruned_read",
    oracle="""
    SELECT o_orderpriority,
      CAST(o_orderdate AS DATE) AS order_date,
      COUNT(*) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_price
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    GROUP BY o_orderpriority, CAST(o_orderdate AS DATE)
    """,
)
def partitioned_write_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned parquet sink + pruned scan (script_01:25-27 / script_07:38
    shape): write orders partitioned by priority, read back filtering two
    partitions — the filter hits PartitionFilters, so only 2/5 of the data
    is scanned."""
    out = _scratch("orders_by_priority")
    orders = load(spark, sf_dir, "orders")
    orders.write.mode("overwrite").partitionBy("o_orderpriority").parquet(out)
    back = spark.read.parquet(out)
    return (
        back.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy("o_orderpriority", F.to_date("o_orderdate").alias("order_date"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(14,2)")).cast("double").alias("total_price"),
        )
    )


# unique-per-invocation DDL state: a fixed table name breaks re-entry under
# an external harness (concurrent or repeated calls in one session), so each
# call creates its own table and lazily drops the ones from prior calls.
_DDL_IDS = itertools.count()
_DDL_PREVIOUS: list[tuple[str, str]] = []  # (table name, scratch path)
_BUCKET_IDS = itertools.count()
_BUCKET_PREVIOUS: list[str] = []  # managed table names


@register(
    "bucketed_join_colocated",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment,
      COUNT(o.o_orderkey) AS n_orders,
      CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_mktsegment
    """,
)
def bucketed_join_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-table co-located join: write both sides `bucketBy` the join
    key as catalog tables, then join and aggregate THROUGH the bucketing —
    zero shuffle exchanges in the whole plan (the join reads co-located
    buckets; the follow-up groupBy on the same key reuses the layout).

    This is the layout play for a 100 TB fact⋈fact join neither side of
    which can broadcast: pay the shuffle once at write time, never at read
    time. Table names are unique per invocation (re-entrant under an
    external harness); previous invocations' tables are dropped lazily."""
    while _BUCKET_PREVIOUS:
        spark.sql(f"DROP TABLE IF EXISTS {_BUCKET_PREVIOUS.pop()}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    _sweep_stale(warehouse.removeprefix("file:"), ("orders_bkt_", "customer_bkt_"))
    run = f"{next(_BUCKET_IDS)}_{uuid.uuid4().hex[:8]}"
    orders_t, cust_t = f"orders_bkt_{run}", f"customer_bkt_{run}"
    (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .write.bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .saveAsTable(orders_t)
    )
    (
        load(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment")
        .write.bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .saveAsTable(cust_t)
    )
    _BUCKET_PREVIOUS.extend([orders_t, cust_t])
    c = spark.table(cust_t)
    o = spark.table(orders_t)
    return (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )


@register(
    "sql_ddl_external_table",
    oracle="""
    SELECT n_regionkey, COUNT(*) AS n_nations,
      MIN(n_name) AS first_nation
    FROM nation
    GROUP BY n_regionkey
    """,
)
def sql_ddl_external_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`CREATE TABLE ... USING parquet LOCATION` DDL (script_09:9-13 shape):
    register an external table over a parquet location in the session
    catalog, then aggregate through the catalog name via spark.sql.

    Re-entrant: table name and location are unique per invocation (the
    returned DataFrame's analyzed plan must stay valid after we return, so
    prior invocations' tables are dropped on the NEXT call, not eagerly)."""
    import shutil

    while _DDL_PREVIOUS:
        prev_table, prev_path = _DDL_PREVIOUS.pop()
        spark.sql(f"DROP TABLE IF EXISTS {prev_table}")
        shutil.rmtree(prev_path, ignore_errors=True)
    _sweep_stale(_SCRATCH, ("nation_external_",))
    run = f"{next(_DDL_IDS)}_{uuid.uuid4().hex[:8]}"
    table = f"nation_ext_{run}"
    out = _scratch(f"nation_external_{run}")
    load(spark, sf_dir, "nation").write.mode("overwrite").parquet(out)
    spark.sql(f"CREATE TABLE {table} USING parquet LOCATION '{out}'")
    _DDL_PREVIOUS.append((table, out))
    return spark.sql(
        f"""
        SELECT n_regionkey, COUNT(*) AS n_nations,
          MIN(n_name) AS first_nation
        FROM {table}
        GROUP BY n_regionkey
        """
    )


@register(
    "jsonl_roundtrip_ingest",
    oracle="""
    SELECT n_name, n_regionkey,
      CAST(length(n_name) AS INT) AS name_len,
      CAST(n_regionkey * 2 AS BIGINT) AS doubled_key
    FROM nation
    """,
)
def jsonl_roundtrip_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink + source (the third major interchange format next to
    the CSV and parquet round-trips): write nation as JSONL, read it back
    with a PINNED schema — at scale you never let the JSON reader
    infer-scan, and a pinned schema makes malformed rows surface as nulls
    under PERMISSIVE mode instead of failing the job."""
    out = _scratch("nation_jsonl")
    nation = load(spark, sf_dir, "nation").select("n_name", "n_regionkey")
    nation.write.mode("overwrite").json(out)
    back = spark.read.schema("n_name STRING, n_regionkey BIGINT").json(out)
    return back.select(
        "n_name",
        "n_regionkey",
        F.length("n_name").cast("int").alias("name_len"),
        (F.col("n_regionkey") * 2).alias("doubled_key"),
    )


@register(
    "orc_roundtrip_ingest",
    oracle="""
    SELECT l_returnflag, l_linestatus,
      COUNT(*) AS n_items,
      CAST(SUM(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
      CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        AS sum_price_c
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def orc_roundtrip_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + source (the columnar interchange format next to parquet —
    native reader/writer, same predicate-pushdown and column-pruning
    surface): write the 1998+ lineitem tail as ORC, read it back, and
    aggregate. The ship-date filter runs BEFORE the write so the sink holds
    only the needed slice; doubles and timestamps round-trip ORC exactly,
    so the integer-cent aggregate matches the oracle computed on the
    original parquet."""
    out = _scratch("orc_lineitem_tail")
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        .select("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice")
    )
    li.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    return back.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.expr("sum(cast(floor(l_quantity) as bigint))").alias("sum_qty"),
        F.expr("sum(cast(floor(l_extendedprice * 100) as bigint))").alias("sum_price_c"),
    )
