"""Checkpoint kill-and-resume recovery of the stateful streaming operator
(r12 verdict #4): every streaming twin is availableNow-replayed to
completion elsewhere in the suite — nothing stopped a query mid-replay and
restarted it from its checkpoint. This file measures the exactly-once
recovery claim directly, on the PRODUCTION operator
(`transition_pairs_stream`, the applyInPandasWithState pipeline behind the
registered `streaming_transition_counts`):

1. the events fixture is staged as K time-ordered parquet chunk files with
   strictly increasing mtimes, streamed with maxFilesPerTrigger=1 so the
   replay takes K micro-batches through a checkpointed FILE sink (the
   memory sink cannot survive a restart; the file sink's _spark_metadata
   transaction log is what makes an interrupted batch invisible);
2. REFERENCE run: all K batches uninterrupted -> rollup -> rows;
3. RECOVERY run: fresh checkpoint/sink, the query is stop()ped mid-replay
   (poll recentProgress; asserted genuinely interrupted via the
   checkpoint's commit log), then RESTARTED from the same checkpoint and
   replayed to termination;
4. the recovered rollup must equal the uninterrupted rollup row-for-row,
   AND both must equal the registered BATCH operator
   (`event_transition_matrix`), whose DuckDB oracle is the shared
   `_TRANSITION_ORACLE` — so the recovery result is anchored to the same
   value contract as the correctness gate, not merely self-consistent.

Time-ordered chunking matters: the GroupState tail contract is batch-local
ordering plus a monotone tail (sessions.py:_count_batch_transitions), so
equality with the batch matrix is only promised when files arrive in true
(ts_us, event_id) order — exactly how the production replay delivers them.

Reference anchor: sessionization/stateful streaming is the reference's one
stateful shape (reference example script_06); recovery-from-checkpoint is
the Structured Streaming contract a 100 TB deployment leans on when an
executor or driver dies mid-job.
"""

from __future__ import annotations

import glob
import os
import shutil
import time

from pyspark.sql import Window
from pyspark.sql import functions as F

from ai_metadata_lineage_pyspark_spark.functions.io import load_events
from ai_metadata_lineage_pyspark_spark.streaming.sessions import (
    rollup_transitions,
    transition_pairs_stream,
)

N_CHUNKS = 12


def _stage_chunks(spark, sf_dir: str, root: str) -> str:
    """Write the events fixture as N_CHUNKS time-ordered parquet files with
    strictly increasing mtimes (the file source processes oldest-first)."""
    src = (
        load_events(spark, sf_dir)
        .select("user_id", "ts_us", "event_id", "event_type")
        .withColumn(
            "chunk",
            F.ntile(N_CHUNKS).over(Window.orderBy("ts_us", "event_id")),
        )
    )
    staged = os.path.join(root, "staged")
    src.write.partitionBy("chunk").mode("overwrite").parquet(staged)
    live = os.path.join(root, "source")
    os.makedirs(live)
    now = time.time()
    for i in range(1, N_CHUNKS + 1):
        (part,) = glob.glob(os.path.join(staged, f"chunk={i}", "part-*.parquet"))
        dst = os.path.join(live, f"{i:03d}.parquet")
        shutil.copyfile(part, dst)
        os.utime(dst, (now + i, now + i))
    return live


def _start(spark, source_dir: str, out_dir: str, ckpt_dir: str):
    schema = "user_id BIGINT, ts_us BIGINT, event_id BIGINT, event_type STRING"
    events = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(source_dir)
    )
    return (
        transition_pairs_stream(events)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def _rollup_rows(spark, out_dir: str):
    # spark.read on a file-sink dir consults _spark_metadata: files from an
    # interrupted (uncommitted) batch are invisible — the exactly-once half
    # of the sink contract this test exists to exercise.
    out = spark.read.parquet(out_dir)
    return sorted(tuple(r) for r in rollup_transitions(out).collect())


def _committed_batches(ckpt_dir: str) -> int:
    return len(
        [n for n in os.listdir(os.path.join(ckpt_dir, "commits")) if n.isdigit()]
    )


def test_kill_and_resume_matches_uninterrupted_and_batch_oracle(
    spark, sf_dir, tmp_path
):
    source = _stage_chunks(spark, sf_dir, str(tmp_path))

    # --- reference: uninterrupted replay ---------------------------------
    ref_out, ref_ckpt = str(tmp_path / "ref_out"), str(tmp_path / "ref_ckpt")
    q = _start(spark, source, ref_out, ref_ckpt)
    q.awaitTermination()
    assert _committed_batches(ref_ckpt) >= N_CHUNKS  # one batch per file
    ref = _rollup_rows(spark, ref_out)

    # --- recovery: stop mid-replay, restart from the same checkpoint -----
    rec_out, rec_ckpt = str(tmp_path / "rec_out"), str(tmp_path / "rec_ckpt")
    interrupted = False
    # stop() races batch completion: stopping after the FIRST observed
    # progress entry (not two — r13 advice: on a fast host all 12 batches
    # could commit before two entries were ever observed) maximizes the
    # mid-replay window, and 10 retries bound the flake probability even
    # if individual attempts keep losing the race on either side
    # (0 committed, or all N_CHUNKS committed).
    for _ in range(10):
        shutil.rmtree(rec_out, ignore_errors=True)
        shutil.rmtree(rec_ckpt, ignore_errors=True)
        q = _start(spark, source, rec_out, rec_ckpt)
        while q.isActive and len(q.recentProgress) < 1:
            time.sleep(0.02)
        q.stop()
        q.awaitTermination()
        done = _committed_batches(rec_ckpt)
        if 0 < done < N_CHUNKS:
            interrupted = True
            break
    assert interrupted, "could not stop the query mid-replay in 10 attempts"

    q = _start(spark, source, rec_out, rec_ckpt)  # resume from checkpoint
    q.awaitTermination()
    assert _committed_batches(rec_ckpt) >= N_CHUNKS
    recovered = _rollup_rows(spark, rec_out)

    assert recovered == ref

    # --- anchor both to the registered batch operator (shared oracle) ----
    from ai_metadata_lineage_pyspark_spark.registry import all_queries

    batch = sorted(
        tuple(r)
        for r in all_queries()["event_transition_matrix"].fn(spark, sf_dir).collect()
    )
    assert ref == batch
