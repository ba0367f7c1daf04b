"""MERGE / SCD-1 semantics: both branches of operators/merge.py.

The relational fallback (the oracle-checked path) is pinned on a small
synthetic target/source so the conditional-update and insert clauses can't
silently drift; the Delta-backed variant is asserted to fail loudly (not
silently no-op) when delta-spark is absent — or, if a future environment
provides Delta, to actually round-trip a merge.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ai_metadata_lineage_pyspark_spark.operators.merge import merge_scd1_delta


def _has_delta() -> bool:
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


def test_scd1_fallback_actions(spark, sf_dir):
    from ai_metadata_lineage_pyspark_spark.registry import all_queries

    df = all_queries()["scd1_merge_customer"].fn(spark, sf_dir)
    actions = {r["merge_action"] for r in df.select("merge_action").distinct().collect()}
    # matched outcomes always occur on the fixture; 'inserted' requires a
    # source key absent from the target (true at sf0.01+, not at sf0.001)
    assert {"updated", "kept"} <= actions <= {"inserted", "updated", "kept"}
    # WHEN MATCHED conditional clause: every 'updated' row took the source
    # balance, which the condition requires to be >= 500
    bad = df.filter((F.col("merge_action") == "updated") & (F.col("acctbal") < 500)).count()
    assert bad == 0
    # inserted rows are source-only: synthetic name marker, source balance
    ins = df.filter(F.col("merge_action") == "inserted")
    assert ins.filter(F.col("name") != "NEW-CUSTOMER").count() == 0


@pytest.mark.skipif(_has_delta(), reason="delta available: gated branch lights up")
def test_delta_merge_raises_without_delta(spark, tmp_path):
    src = spark.range(3).select(F.col("id").alias("k"), F.lit(1.0).alias("v"))
    with pytest.raises(RuntimeError, match="delta-spark not available"):
        merge_scd1_delta(spark, str(tmp_path / "tgt"), src, "k")


@pytest.mark.skipif(not _has_delta(), reason="delta-spark not installed")
def test_delta_merge_round_trip(spark, tmp_path):  # pragma: no cover - env-gated
    path = str(tmp_path / "tgt")
    base = spark.range(3).select(F.col("id").alias("k"), F.lit(1.0).alias("v"))
    merge_scd1_delta(spark, path, base, "k")  # creates the table
    upd = spark.range(2, 5).select(F.col("id").alias("k"), F.lit(2.0).alias("v"))
    merge_scd1_delta(spark, path, upd, "k")  # upserts
    out = {r["k"]: r["v"] for r in spark.read.format("delta").load(path).collect()}
    assert out == {0: 1.0, 1: 1.0, 2: 2.0, 3: 2.0, 4: 2.0}
