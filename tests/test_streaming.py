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
