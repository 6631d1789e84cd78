"""applyInPandasWithState operators: state must survive across triggers.

Strategy: a file-source stream with availableNow triggers and a shared
checkpoint. Run 1 processes batch-1 files; run 2 (same checkpoint)
processes newly added files with the state store restored — a session
spanning the two runs must keep one session id, and burst counters must
accumulate.
"""

import os
import time

import pandas as pd

from ai_incident_analyst_spark.streaming.stateful import (
    streaming_burst_monitor,
    streaming_sessionize,
)

SCHEMA = "user_id long, ts timestamp"


def _write_batch(spark, src_dir, rows, name):
    pdf = pd.DataFrame(rows, columns=["user_id", "ts"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(src_dir)


def _run_once(spark, src_dir, ckpt, out_tbl, op, mode="append"):
    # memory sink can't recover from a checkpoint; foreachBatch can
    collected = []
    stream = spark.readStream.schema(SCHEMA).parquet(src_dir)
    q = (op(stream).writeStream
         .foreachBatch(lambda df, _id: collected.extend(df.collect()))
         .outputMode(mode)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    return collected


def test_sessionize_state_survives_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)

    _write_batch(spark, src, [
        (1, "2024-01-01 10:00:00"),
        (1, "2024-01-01 10:10:00"),   # same session
        (2, "2024-01-01 10:00:00"),
    ], "b1")
    out1 = _run_once(spark, src, ckpt, "sess1",
                     lambda s: streaming_sessionize(s, "user_id", "ts", 1800))
    got1 = {(r.user_id, r.ts.strftime("%H:%M")): r.session_id for r in out1}
    assert got1 == {(1, "10:00"): 1, (1, "10:10"): 1, (2, "10:00"): 1}

    # second run, same checkpoint: 10:20 continues session 1 (gap 10m);
    # 12:00 opens session 2 — proves last_ts/sid were restored, not reset
    _write_batch(spark, src, [
        (1, "2024-01-01 10:20:00"),
        (1, "2024-01-01 12:00:00"),
    ], "b2")
    out2 = _run_once(spark, src, ckpt, "sess2",
                     lambda s: streaming_sessionize(s, "user_id", "ts", 1800))
    got2 = {(r.user_id, r.ts.strftime("%H:%M")): r.session_id for r in out2}
    assert got2 == {(1, "10:20"): 1, (1, "12:00"): 2}


def test_burst_monitor_accumulates_across_runs(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)

    _write_batch(spark, src,
                 [(7, f"2024-01-01 10:00:{i:02d}") for i in range(12)], "b1")
    out1 = _run_once(spark, src, ckpt, "burst1",
                     lambda s: streaming_burst_monitor(s, "user_id", "ts", 10),
                     mode="update")
    (r1,) = out1
    assert (r1.events_total, r1.events_this_trigger, r1.burst) == (12, 12, 1)

    _write_batch(spark, src,
                 [(7, f"2024-01-01 11:00:{i:02d}") for i in range(3)], "b2")
    out2 = _run_once(spark, src, ckpt, "burst2",
                     lambda s: streaming_burst_monitor(s, "user_id", "ts", 10),
                     mode="update")
    (r2,) = out2
    # total carries the 12 from run 1; this trigger's 3 is below threshold
    assert (r2.events_total, r2.events_this_trigger, r2.burst) == (15, 3, 0)
