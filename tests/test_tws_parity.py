"""transformWithStateInPandas coverage hook (VERDICT r06 next-step #5).

pyspark 4.1.2 exposes `transformWithStateInPandas` (the Spark-4 successor
to applyInPandasWithState), and streaming/sessions.py implements the
transition-counting operator against it — but the
TransformWithStateInPySpark driver worker hard-imports google.protobuf for
its state-server protocol, which is not installed in this sandbox and
installs are out of contract (ARTIFACTS/r07_tws_attempt.md records the
exact failure: STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE, ImportError
on google.protobuf). In any protobuf-enabled environment these tests
auto-unskip and assert:

1. full-run parity: streaming_transition_counts_tws == the oracle-checked
   applyInPandasWithState operator's result (same events fixture);
2. multi-batch statefulness: driven through >= 3 REAL file-source
   micro-batches (maxFilesPerTrigger=1), cross-batch transitions counted
   exactly once.
"""

from __future__ import annotations

import os
import time
from datetime import datetime

import pytest

pytest.importorskip(
    "google.protobuf",
    reason="transformWithState driver worker needs protobuf; not in this sandbox",
)

from pyspark.sql import functions as F  # noqa: E402


def test_tws_full_run_matches_apply_in_pandas_with_state(spark, sf_dir):
    from ai_metadata_lineage_pyspark_spark.streaming.sessions import (
        streaming_transition_counts,
        streaming_transition_counts_tws,
    )

    expect = {
        (r.prev_type, r.next_type): (r.n, r.prob_ppm)
        for r in streaming_transition_counts(spark, sf_dir).collect()
    }
    got = {
        (r.prev_type, r.next_type): (r.n, r.prob_ppm)
        for r in streaming_transition_counts_tws(spark, sf_dir).collect()
    }
    assert got == expect


def test_tws_multi_batch_cross_boundary_transition(spark, tmp_path):
    """Three single-file micro-batches; the (B1-tail -> B2-head) and
    (B2-tail -> B3-head) pairs must each be counted exactly once, proving
    the ValueState tail survives batch boundaries."""
    from ai_metadata_lineage_pyspark_spark.streaming.sessions import (
        _TRANS_OUT_SCHEMA,
        _TWS_PROVIDER,
        _make_transition_processor,
    )

    src = str(tmp_path / "tws_src")
    os.makedirs(src)
    t = lambda h, m: datetime(2026, 1, 1, h, m, 0)  # noqa: E731
    now = time.time()
    batches = [
        [(1, t(9, 0), 1, "view"), (2, t(9, 5), 1, "click")],
        [(3, t(9, 10), 1, "buy")],
        [(4, t(9, 15), 1, "view")],
    ]
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string"
        )
        p = os.path.join(src, f"b{i}.parquet")
        df.coalesce(1).write.mode("overwrite").parquet(p)
        os.utime(p, (now - 100 + 30 * i, now - 100 + 30 * i))

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", _TWS_PROVIDER)
    try:
        schema = spark.read.parquet(os.path.join(src, "b0.parquet")).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/*")
            .withColumn("ts_us", F.unix_micros("ts"))
        )
        trans = stream.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=_make_transition_processor(),
            outputStructType=_TRANS_OUT_SCHEMA,
            outputMode="append",
            timeMode="none",
        )
        q = (
            trans.writeStream.format("memory")
            .queryName("tws_mb")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        progress = len(q.recentProgress)
        got = {
            (r.prev_type, r.next_type): r.n
            for r in spark.table("tws_mb")
            .groupBy("prev_type", "next_type")
            .agg(F.sum("n").alias("n"))
            .collect()
        }
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    assert progress >= 3, f"expected >=3 micro-batches, got {progress}"
    assert got == {("view", "click"): 1, ("click", "buy"): 1, ("buy", "view"): 1}
