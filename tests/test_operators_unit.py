"""Semantic unit tests for custom operators on tiny hand-built inputs —
independent of the fixture parquet, so failures localize to the operator.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from ai_metadata_lineage_pyspark_spark.functions.vectors import cosine_expr, dot_expr


def test_cosine_expr_matches_python(spark):
    a = [1.0, 2.0, 3.0, 0.5]
    b = [-1.0, 0.25, 4.0, 2.0]
    df = spark.createDataFrame([(a, b)], ["a", "b"])
    got = df.select(F.expr(cosine_expr("a", "b")).alias("c")).first().c
    dot = sum(x * y for x, y in zip(a, b))
    want = dot / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))
    assert got == pytest.approx(want, abs=1e-12)


def test_dot_expr_on_float_arrays_casts_to_double(spark):
    df = spark.createDataFrame([([0.1, 0.2], [0.3, 0.4])], "a array<float>, b array<float>")
    got = df.select(F.expr(dot_expr("a", "b")).alias("d")).first().d
    assert isinstance(got, float)
    assert got == pytest.approx(0.11, abs=1e-6)


def test_exact_dedup_groups_whitespace_and_case_variants(spark, sf_dir, tmp_path):
    # Build a miniature documents table exercising the normalization:
    # same text modulo case/whitespace -> one group, canonical = min(doc_id).
    rows = [
        (3, "Hello   world", 13),
        (1, "hello world", 11),
        (2, "different text", 14),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "n_chars"])
    p = str(tmp_path / "documents.parquet")
    docs.write.parquet(p)
    from ai_metadata_lineage_pyspark_spark.operators.dedup import exact_dedup

    out = {r.canonical_doc_id: r.n_copies for r in exact_dedup(spark, str(tmp_path)).collect()}
    assert out == {1: 2, 2: 1}


def test_minhash_signature_determinism(spark, tmp_path):
    # Identical shingle sets -> identical signatures regardless of doc order.
    rows = [
        (1, "the quick brown fox jumps", 25),
        (2, "the quick brown fox jumps", 25),
        (3, "a completely different document body", 36),
    ]
    spark.createDataFrame(rows, ["doc_id", "text", "n_chars"]).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    from ai_metadata_lineage_pyspark_spark.operators.dedup import minhash_signatures

    sigs = {r.doc_id: tuple(r[f"sig_{j}"] for j in range(8))
            for r in minhash_signatures(spark, str(tmp_path)).collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[3]


def test_simhash_bit_packing_roundtrip(spark, tmp_path):
    spark.createDataFrame(
        [(1, "alpha beta gamma", 16)], ["doc_id", "text", "n_chars"]
    ).write.parquet(str(tmp_path / "documents.parquet"))
    from ai_metadata_lineage_pyspark_spark.operators.dedup import simhash

    r = simhash(spark, str(tmp_path)).first()
    # hex rendering and packed int must encode the same 32 bits
    assert int(r.simhash_hex, 16) == r.simhash_int
    assert 0 <= r.simhash_int < 2**32


def test_sessionization_gap_semantics(spark, tmp_path):
    # Three events for one user: two within 30min, one 31min later ->
    # 2 sessions. Build a nanos-timestamped events.parquet like the fixture.
    base = 1_700_000_000_000_000_000  # nanos
    rows = [
        (1, 10, "view", base),
        (2, 10, "click", base + 60 * 10**9),  # +1 min, same session
        (3, 10, "view", base + (60 + 31 * 60) * 10**9),  # +31 min gap, new
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts long"
    )
    df.write.parquet(str(tmp_path / "events.parquet"))
    from ai_metadata_lineage_pyspark_spark.operators.windows import web_sessionization

    out = web_sessionization(spark, str(tmp_path)).collect()
    assert len(out) == 2
    assert sorted(r.events for r in out) == [1, 2]


def test_fan_out_survives_missing_private_jdf(spark, monkeypatch):
    """fan_out's size probe goes through the private `_jdf` seam; under
    Spark Connect (or a future PySpark) that attribute is gone. The probe
    must degrade to a plain repartition, never crash the caller."""
    from ai_metadata_lineage_pyspark_spark.functions.io import fan_out

    df = spark.range(100)
    real_jdf = df._jdf

    class _NoQueryExecution:
        # models Spark Connect: the plan-stats probe is unavailable but
        # DataFrame operations (repartition etc.) still work
        def queryExecution(self):
            raise RuntimeError("queryExecution unavailable in this session")

        def __getattr__(self, name):
            return getattr(real_jdf, name)

    with monkeypatch.context() as m:
        m.setattr(df, "_jdf", _NoQueryExecution(), raising=False)
        out = fan_out(df, min_partitions=8)
    assert out.rdd.getNumPartitions() == 8
    assert out.count() == 100
