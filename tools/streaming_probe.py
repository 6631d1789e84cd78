"""Streaming-layer scale cell (round-12 judge ask #7): measure the
windowed-dedup + history-append micro-batch loop at a real SF.

The streaming operators are pytest-proven (checkpoint-restart identity,
tests/test_stateful_streaming.py) but had no measured scale row. This
probe drives the §2.9 flagship composition end to end with Structured
Streaming's file source:

  1. stage the sf events table as N parquet chunk files (the stream
     "arrival order" is event-time order, as a log tailer would see)
  2. readStream(maxFilesPerTrigger) -> streaming_dedup (watermarked
     dropDuplicates on event_id) -> streaming_history_sink (append
     parquet via foreachBatch), trigger availableNow
  3. a second query: streaming_count_by_window (1-day tumbling windows,
     1-day watermark, grouped by event_type) to a memory-less noop-style
     foreachBatch count

Reported per query: rows/sec end-to-end, micro-batch count, PEAK STATE
ROWS (stateOperators.numRowsTotal from query progress) — the number
that proves the watermark bounds state instead of accumulating the
corpus. Usage: python tools/streaming_probe.py [sf_dir] [n_files]
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

from pyspark.sql import functions as F

from ai_incident_analyst_spark.session import get_spark
from ai_incident_analyst_spark.streaming.pipeline import (
    streaming_count_by_window, streaming_dedup, streaming_history_sink)


def peak_state_rows(query) -> int:
    peak = 0
    for p in query.recentProgress:
        for so in (p.get("stateOperators") or []):
            peak = max(peak, int(so.get("numRowsTotal") or 0))
    return peak


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata/sf1"
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark("streaming-probe")
    work = tempfile.mkdtemp(prefix="stream_probe_")
    src = os.path.join(work, "src")
    try:
        # raw twin parquet reads ts as TIMESTAMP_NTZ under Spark 4 (the
        # sources/tables._normalize gotcha); watermarks need TIMESTAMP
        events = (spark.read.parquet(f"{sf_dir}/events.parquet")
                  .withColumn("ts", F.col("ts").cast("timestamp")))
        n_rows = events.count()
        # event-time order across files = the arrival order a log
        # follower sees; within-file order is irrelevant to watermarks
        (events.repartitionByRange(n_files, "ts")
         .write.mode("overwrite").parquet(src))
        # FileStreamSource batches by MODIFICATION TIME, and the 20
        # range files were written in parallel with interleaved mtimes —
        # the first run arrived effectively shuffled and the watermark
        # dropped 55% of rows as late. Force mtimes ascending in path
        # order (range partitioning writes part-00000 = earliest ts), so
        # arrival order == event-time order, as for a real log tailer.
        parts = sorted(f for f in os.listdir(src)
                       if f.startswith("part-"))
        base = time.time() - len(parts) - 10
        for i, f in enumerate(parts):
            os.utime(os.path.join(src, f), (base + i, base + i))
        schema = events.schema
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 2)
                  .parquet(src))

        # cell 1: watermarked dedup -> append-only history parquet
        dd = streaming_dedup(stream, ["event_id"], ts_col="ts",
                             watermark="1 hour")
        t0 = time.time()
        q = streaming_history_sink(
            dd, os.path.join(work, "hist"),
            os.path.join(work, "ckpt_hist"), trigger_once=True).start()
        q.awaitTermination()
        wall = time.time() - t0
        batches = len(q.recentProgress)
        state = peak_state_rows(q)
        out_rows = spark.read.parquet(os.path.join(work, "hist")).count()
        print(f"| dedup+history sink | {n_rows:,} | {out_rows:,} "
              f"| {batches} | {wall:.1f}s | {n_rows/wall:,.0f} rows/s "
              f"| {state:,} |")

        # cell 2: tumbling-window counts by event_type
        wc = streaming_count_by_window(stream, ts_col="ts",
                                       window="1 day", watermark="1 day",
                                       group_col="event_type")

        def sink(batch_df, batch_id):
            batch_df.write.format("noop").mode("overwrite").save()

        t0 = time.time()
        q2 = (wc.writeStream.outputMode("append")
              .option("checkpointLocation", os.path.join(work, "ckpt_win"))
              .foreachBatch(sink).trigger(availableNow=True).start())
        q2.awaitTermination()
        wall2 = time.time() - t0
        print(f"| windowed counts | {n_rows:,} | — "
              f"| {len(q2.recentProgress)} | {wall2:.1f}s "
              f"| {n_rows/wall2:,.0f} rows/s | {peak_state_rows(q2):,} |")
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
