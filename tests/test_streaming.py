"""Multi-batch Structured Streaming semantics: watermark-driven window
finalization and late-data dropping, exercised across real micro-batches
(maxFilesPerTrigger=1), not just the single-batch parity path.

Spark uses a two-phase watermark (SPARK-24634, 3.4+): the LATE-ROW FILTER
in batch N uses the watermark committed before batch N-1 finished, while
STATE EVICTION / append emission uses the current one. A late row is
therefore only dropped once the advancing event is two completed batches
behind it — the test layout below respects that.
"""

from __future__ import annotations

import os
import time
from datetime import datetime

from pyspark.sql import functions as F


def _write_batch(spark, rows, path, mtime):
    df = spark.createDataFrame(rows, "ts timestamp, user_id long")
    df.coalesce(1).write.mode("append").parquet(path)
    # the file source orders micro-batches by modification time — pin it
    for f in os.listdir(path):
        if f.endswith(".parquet"):
            full = os.path.join(path, f)
            if os.path.getmtime(full) > mtime - 0.5:
                os.utime(full, (mtime, mtime))


def test_watermark_finalizes_windows_and_drops_late_rows(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    os.makedirs(src)
    t = lambda h, m: datetime(2026, 1, 1, h, m, 0)  # noqa: E731

    now = time.time()
    # batch 0: two events in [10:00, 11:00); 11:05 advances the eviction
    # watermark to 10:55 at batch end
    _write_batch(spark, [(t(10, 5), 1), (t(10, 20), 2), (t(11, 5), 1)], src, now - 100)
    # batch 1: an on-time event; after this batch completes, the 10:55
    # watermark becomes active for the LATE filter too
    _write_batch(spark, [(t(11, 10), 2)], src, now - 70)
    # batch 2: a LATE event at 09:30 (behind the 10:55 late-filter watermark
    # -> dropped, its window never appears) and 12:10, which advances the
    # eviction watermark to 12:00 and finalizes [10:00, 11:00) + [11:00, 12:00)
    _write_batch(spark, [(t(9, 30), 3), (t(12, 10), 2)], src, now - 40)

    counts = (
        spark.readStream.schema("ts timestamp, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("events"))
        .select(F.hour("w.start").alias("h"), "events")
    )
    q = (
        counts.writeStream.format("memory")
        .queryName("wm_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    rows = {(r.h, r.events) for r in spark.table("wm_test").collect()}
    # appended = finalized windows only: [10:00) with 2 events, [11:00) with
    # 11:05 + 11:10; the late 09:30 row was dropped (no (9, 1) row) and
    # 12:10's window is not yet finalizable
    assert rows == {(10, 2), (11, 2)}


def _await_rows(snapshots, target, q, timeout_s=120):
    """Wait until the latest complete-mode snapshot accounts for `target`
    input rows, then stop the query."""
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        if snapshots and sum(e for e, _ in snapshots[-1][1].values()) >= target:
            break
        time.sleep(0.2)
    q.stop()
    q.awaitTermination()


def test_custom_source_multi_batch_replay(spark):
    """VERDICT r04 next-step #6: streaming_replay_counts' source driven
    through REAL incremental micro-batches (maxRowsPerBatch), with the
    aggregate state after EVERY batch asserted equal to the batch shadow
    over the row prefix admitted so far — not just final-state parity."""
    import pyarrow.parquet as pq

    from ai_metadata_lineage_pyspark_spark.sources.pydatasource import (
        EventsReplayDataSource,
    )

    path = "/root/testdata/sf0.001/events.parquet"
    total = pq.ParquetFile(path).metadata.num_rows
    max_rows = (total + 4) // 5  # ~5 micro-batches

    spark.dataSource.register(EventsReplayDataSource)
    stream = (
        spark.readStream.format("events_replay")
        .option("path", path)
        .option("maxRowsPerBatch", str(max_rows))
        .load()
    )
    agg = stream.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("events"), F.sum("user_id").alias("sum_user_ids")
    )

    snapshots: list[tuple[int, dict]] = []

    def capture(bdf, bid: int) -> None:
        snapshots.append(
            (bid, {r["event_type"]: (r["events"], r["sum_user_ids"]) for r in bdf.collect()})
        )

    q = (
        agg.writeStream.foreachBatch(capture)
        .outputMode("complete")
        .trigger(processingTime="0 seconds")
        .start()
    )
    _await_rows(snapshots, total, q)

    assert len(snapshots) >= 3, f"expected >=3 micro-batches, got {len(snapshots)}"
    # prefix shadow: the source admits rows in file order, so after a batch
    # whose state covers n rows, the state must equal a batch groupBy over
    # the FIRST n rows of the parquet file
    pdf = pq.read_table(path, columns=["user_id", "event_type"]).to_pandas()
    seen = -1
    for _bid, snap in snapshots:
        n = sum(e for e, _ in snap.values())
        assert n > seen, "complete-mode state must grow monotonically"
        seen = n
        prefix = pdf.iloc[:n]
        expected = {
            et: (int(g["user_id"].size), int(g["user_id"].sum()))
            for et, g in prefix.groupby("event_type")
        }
        assert snap == expected, f"state after {n} rows diverges from batch shadow"
    assert seen == total  # every row arrived exactly once


def test_session_window_multi_batch_state_evolution(spark, tmp_path):
    """Watermarked session_window across 3 file-source micro-batches:
    after every batch, complete-mode session state equals the batch-mode
    session computation over the files admitted so far — including a
    session that MERGES when a later batch bridges the gap."""
    src = str(tmp_path / "sess_src")
    os.makedirs(src)
    t = lambda h, m: datetime(2026, 1, 1, h, m, 0)  # noqa: E731
    now = time.time()

    batches = [
        # batch 0: u1 has two sessions-to-be (09:00 and 10:30), u2 one
        [(t(9, 0), 1), (t(10, 30), 1), (t(9, 10), 2)],
        # batch 1: 09:20 extends u1's first session; u2 gets a second session
        [(t(9, 20), 1), (t(11, 0), 2)],
        # batch 2: 10:05 is 45 min past 09:20 (no merge with the morning
        # session) but 25 min before 10:30 -> it EXTENDS the 10:30 session
        # backward, re-keying that session's start to 10:05
        [(t(10, 5), 1)],
    ]
    for i, rows in enumerate(batches):
        _write_batch(spark, rows, src, now - 100 + 30 * i)

    events = (
        spark.readStream.schema("ts timestamp, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "30 minutes")
    )
    sessions = (
        events.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("events"))
        .select("user_id", F.hour("w.start").alias("start_h"),
                F.minute("w.start").alias("start_m"), "events")
    )

    snapshots: list[tuple[int, set]] = []

    def capture(bdf, bid: int) -> None:
        snapshots.append((bid, {tuple(r) for r in bdf.collect()}))

    q = (
        sessions.writeStream.foreachBatch(capture)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert len(snapshots) == 3, f"expected 3 micro-batches, got {len(snapshots)}"
    expected_by_batch = [
        # (user_id, start_h, start_m, events)
        {(1, 9, 0, 1), (1, 10, 30, 1), (2, 9, 10, 1)},
        {(1, 9, 0, 2), (1, 10, 30, 1), (2, 9, 10, 1), (2, 11, 0, 1)},
        # 10:05 merges into the 10:30 session (25 min gap), moving its
        # start; the 09:00 session is untouched (09:20 -> 10:05 is 45 min)
        {(1, 9, 0, 2), (1, 10, 5, 2), (2, 9, 10, 1), (2, 11, 0, 1)},
    ]
    for (bid, got), want in zip(snapshots, expected_by_batch):
        assert got == want, f"batch {bid}: {got} != {want}"


def test_streaming_kmv_merge_across_real_micro_batches(spark):
    """streaming_kmv_sketch's merge (union + keep-k-smallest-distinct)
    driven through REAL incremental micro-batches via the replay source:
    the final sketch must equal the batch sketch over all events — the
    semilattice-merge property that makes the sketch batch-split-proof.
    (The registry entry reads the parquet file source, which may deliver
    a single availableNow batch; this test forces >=3.)"""
    import time as _t

    import pyarrow.parquet as pq

    from ai_metadata_lineage_pyspark_spark.sources.pydatasource import (
        EventsReplayDataSource,
    )
    from ai_metadata_lineage_pyspark_spark.streaming.upsert import (
        _SKW_K,
        _reduce_kmv,
    )

    path = "/root/testdata/sf0.001/events.parquet"
    total = pq.ParquetFile(path).metadata.num_rows
    max_rows = (total + 4) // 5  # ~5 micro-batches

    spark.dataSource.register(EventsReplayDataSource)
    stream = (
        spark.readStream.format("events_replay")
        .option("path", path)
        .option("maxRowsPerBatch", str(max_rows))
        .load()
    )
    h_expr = (
        "cast(conv(substr(md5(cast(user_id as string)), 1, 8), 16, 10) as double)"
        " / 4294967296.0 AS h"
    )
    hashed = stream.selectExpr("event_type", h_expr)

    state = {"sketch": None, "rows": 0, "batches": 0}

    def merge(bdf, bid: int) -> None:
        state["rows"] += bdf.count()
        state["batches"] += 1
        bs = _reduce_kmv(bdf)
        merged = bs if state["sketch"] is None else _reduce_kmv(
            state["sketch"].unionByName(bs)
        )
        state["sketch"] = merged.localCheckpoint(eager=True)

    q = (
        hashed.writeStream.foreachBatch(merge)
        .trigger(processingTime="0 seconds")
        .start()
    )
    deadline = _t.time() + 120
    while _t.time() < deadline and state["rows"] < total:
        _t.sleep(0.2)
    q.stop()
    q.awaitTermination()

    assert state["batches"] >= 3, f"expected >=3 micro-batches, got {state['batches']}"
    assert state["rows"] == total
    # batch shadow: same k-min-distinct sketch over the whole table at once
    batch = spark.read.parquet(path).selectExpr("event_type", h_expr)
    expected = {
        (r.event_type, r.h) for r in _reduce_kmv(batch).collect()
    }
    got = {(r.event_type, r.h) for r in state["sketch"].collect()}
    assert got == expected
    assert all(
        n <= _SKW_K
        for n in state["sketch"].groupBy("event_type").count().rdd.map(lambda r: r[1]).collect()
    )


def test_streaming_decontam_gate_matches_batch_filter(spark, sf_dir):
    """The availableNow replay of the ingest gate must reproduce the batch
    evaluation of the SAME gate frame (same fitted bitmap, same KM
    probes) — streaming execution must not change the census."""
    from ai_metadata_lineage_pyspark_spark.streaming.gates import (
        _bloom_bits,
        _gate_frame,
        streaming_decontam_gate,
    )

    got = {
        (r.doc_id, r.n_shingles, r.n_bloom_hits)
        for r in streaming_decontam_gate(spark, sf_dir).collect()
    }
    batch_docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    want = {
        (r.doc_id, r.n_shingles, r.n_bloom_hits)
        for r in _gate_frame(batch_docs, _bloom_bits(spark, sf_dir)).collect()
    }
    assert got == want
    # every true contamination must be flagged (Bloom has no false negatives)
    from ai_metadata_lineage_pyspark_spark.operators.decontam import (
        benchmark_decontam,
    )

    truly_contaminated = {r.doc_id for r in benchmark_decontam(spark, sf_dir).collect()}
    assert truly_contaminated <= {d for d, _, _ in got}


def test_gate_vectorized_probe_equals_hof_variant(spark, sf_dir):
    """The vectorized mapInPandas probe (the default) and the pure-
    expression HOF-lambda variant must produce an identical census —
    the KM h1/h2 extraction from md5 digest bytes must be byte-identical
    to the conv(substr(md5(..))) expression."""
    from ai_metadata_lineage_pyspark_spark.streaming.gates import (
        _bloom_bits,
        _gate_frame,
        _gate_frame_hof,
    )

    bits = _bloom_bits(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {
        (r.doc_id, r.n_shingles, r.n_bloom_hits)
        for r in _gate_frame(docs, bits).collect()
    }
    want = {
        (r.doc_id, r.n_shingles, r.n_bloom_hits)
        for r in _gate_frame_hof(docs, bits).collect()
    }
    assert got == want
    assert got  # non-vacuous: the fixture has contaminated docs


def test_streaming_vocab_topk_matches_batch_counts(spark, sf_dir):
    """Complete-mode streaming top-k must equal the batch wordcount's
    occurrence counts on the availableNow replay."""
    from ai_metadata_lineage_pyspark_spark.operators.profile import corpus_vocabulary
    from ai_metadata_lineage_pyspark_spark.streaming.gates import streaming_vocab_topk

    got = {(r.token, r.n_occurrences) for r in streaming_vocab_topk(spark, sf_dir).collect()}
    want = {
        (r.token, r.n_occurrences) for r in corpus_vocabulary(spark, sf_dir).collect()
    }
    assert got == want
