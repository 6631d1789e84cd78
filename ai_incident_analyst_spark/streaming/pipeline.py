"""Structured Streaming variants of the batch pipeline (SURVEY.md §2.9).

The reference is a 24 h batch-polling loop (new_relic_fetcher.py:67,79;
append-only history main.py:88-92) — exactly the incremental-batch shape
Structured Streaming formalizes. These builders take a *streaming*
DataFrame (readStream source) and return the transformed stream; sinks
use foreachBatch so the batch operators are reused verbatim.

Watermarks bound state: the reference silently accepts late data
(history append + full recompute per request, app.py:16-27); we declare
the lateness tolerance explicitly instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_dedup(stream: DataFrame, keys: list[str], ts_col: str = "ts",
                    watermark: str = "1 hour") -> DataFrame:
    """A2 as a stream: bounded-state dropDuplicates within the watermark
    (preprocessor.py:30-42's run-scoped dedup, generalized)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicates(keys)


def streaming_count_by_window(stream: DataFrame, ts_col: str = "ts",
                              window: str = "1 day",
                              watermark: str = "1 day",
                              group_col: str | None = None) -> DataFrame:
    """A4 as a stream: tumbling-window counts with late-data tolerance
    (app.py:22-27's per-day counts)."""
    keys = [F.window(F.col(ts_col), window).alias("win")]
    if group_col:
        keys.append(F.col(group_col))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*keys)
        .count()
        .select(F.col("win.start").alias("window_start"),
                *([group_col] if group_col else []),
                "count")
    )


def streaming_history_sink(stream: DataFrame, path: str, checkpoint: str,
                           trigger_once: bool = True):
    """S6 as a stream: append-only history parquet via foreachBatch
    (main.py:88-92's 'dashboard updates on refresh' loop)."""
    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(path)

    writer = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(write_batch)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer


def streaming_interval_join(left: DataFrame, right: DataFrame,
                            key: str, left_ts: str = "ts",
                            right_ts: str = "ts",
                            within: str = "1 hour",
                            watermark: str = "2 hours") -> DataFrame:
    """Stream-stream inner join: left events matched to right events on
    ``key`` with ``right.ts <= left.ts <= right.ts + within`` — the
    streaming analog of ``operators.temporal.range_join`` (e.g. purchases
    within an hour after an error by the same user, correlated live).

    Both sides carry watermarks and the join condition bounds the event-
    time range in BOTH directions, which is what lets Spark evict join
    state: each side's buffered rows are dropped once the other side's
    watermark passes the range bound, so state is O(rate × within), not
    unbounded. Without the range condition a stream-stream join must keep
    every row forever — the canonical OOM-at-scale mistake.
    """
    lts, rts = f"__l_{left_ts}", f"__r_{right_ts}"
    l = (left.withColumnRenamed(left_ts, lts)
         .withColumnRenamed(key, "__l_key")
         .withWatermark(lts, watermark))
    r = (right.withColumnRenamed(right_ts, rts)
         .withColumnRenamed(key, "__r_key")
         .withWatermark(rts, watermark))
    cond = (
        (F.col("__l_key") == F.col("__r_key"))
        & (F.col(lts) >= F.col(rts))
        & (F.col(lts) <= F.col(rts) + F.expr(f"INTERVAL {within}"))
    )
    return (
        l.join(r, cond, "inner")
        .withColumnRenamed("__l_key", key)
        .withColumnRenamed(lts, left_ts)
        .withColumnRenamed(rts, f"right_{right_ts}")
        .drop("__r_key")
    )


def streaming_rollup_sink(stream: DataFrame, path: str, checkpoint: str,
                          ts_col: str, dims: list[str], value_col: str,
                          bucket: str = "day"):
    """Continuous aggregate as a stream: maintain a parquet rollup table
    incrementally via ``foreachBatch`` + ``operators.rollup`` algebra.

    Each micro-batch is rolled up on its own (a batch-local groupBy over
    minutes of data), then merged with the stored rollup — a keyed
    re-aggregation over ROLLUP rows (buckets x dims), never a reread of
    raw history. This is how the reference's dashboard metrics
    (``app.py:15-44``, full recompute per request) stay O(rollup) at
    100 TB: readers hit ``path``; the raw stream is never re-scanned.

    The rewrite goes to a staging dir then swaps, so readers never see a
    half-written rollup. Exactly-once: foreachBatch may retry a batch —
    the swap is idempotent per batch_id because the merge input is
    recomputed from the stored pre-swap rollup each attempt.
    """
    import os
    import shutil

    from ..operators.rollup import build_rollup, merge_rollups

    spark = stream.sparkSession

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_roll = build_rollup(batch_df, ts_col, dims, value_col, bucket)
        if os.path.exists(path):
            stored = spark.read.parquet(path)
            merged = merge_rollups(stored, batch_roll, value_col)
        else:
            merged = batch_roll
        staged = path.rstrip("/") + f".stage-{batch_id}"
        merged.write.mode("overwrite").parquet(staged)
        old = path.rstrip("/") + ".old"
        if os.path.exists(path):
            os.rename(path, old)
        os.rename(staged, path)
        shutil.rmtree(old, ignore_errors=True)

    return (
        stream.writeStream
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(merge_batch)
    )


def streaming_histogram_sink(stream: DataFrame, path: str, checkpoint: str,
                             group_cols: list[str], value_col: str,
                             lo: float, hi: float, buckets: int = 400):
    """Streaming QUANTILES: maintain the mergeable fixed-grid histogram
    sketch (``operators/sketch.histogram_sketch_*``) incrementally —
    each micro-batch builds its own bucket counts and merges them into
    the stored sketch by summing matching buckets. Readers interpolate
    any quantile from ``path`` (``histogram_sketch_quantile``) without
    touching the stream or raw history — the non-additive measure
    ``streaming_rollup_sink`` couldn't maintain. Same staged atomic
    swap; idempotent per batch retry for the same reason.
    """
    import os
    import shutil

    from ..operators.sketch import (
        histogram_sketch_build,
        histogram_sketch_merge,
    )

    spark = stream.sparkSession

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_sk = histogram_sketch_build(batch_df, group_cols, value_col,
                                          lo, hi, buckets)
        if os.path.exists(path):
            stored = spark.read.parquet(path)
            merged = histogram_sketch_merge(
                stored.unionByName(batch_sk), group_cols)
        else:
            merged = batch_sk
        staged = path.rstrip("/") + f".stage-{batch_id}"
        merged.write.mode("overwrite").parquet(staged)
        old = path.rstrip("/") + ".old"
        if os.path.exists(path):
            os.rename(path, old)
        os.rename(staged, path)
        shutil.rmtree(old, ignore_errors=True)

    return (
        stream.writeStream
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(merge_batch)
    )


def streaming_index_dedup_sink(stream: DataFrame, index_path: str,
                               out_path: str, checkpoint: str,
                               id_col: str, text_col: str,
                               num_perm: int = 64, bands: int = 16,
                               n: int = 3, threshold: float = 0.5,
                               hash_fn: str = "xxhash64",
                               trigger_once: bool = True):
    """Streaming ingest deduplicated against the PERSISTED corpus MinHash
    index: each micro-batch probes ``operators/dedup.minhash_probe_index``
    and only docs with no near-dup in the corpus are appended to
    ``out_path``. Unlike ``stateful.streaming_neardup_gate`` (whose LSH
    state lives in the state store and guards within-stream dups), this
    gate checks against the full historical corpus without re-shingling
    it — the daily-ingest dedup shape, surviving restarts because the
    index is on disk, not in stream state.
    """
    from ..operators.dedup import minhash_probe_index

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_df.isEmpty():
            return
        hits = minhash_probe_index(
            spark, index_path, batch_df, id_col, text_col,
            num_perm=num_perm, bands=bands, n=n, threshold=threshold,
            hash_fn=hash_fn).select(F.col("new_id").alias(id_col)).distinct()
        batch_df.join(hits, id_col, "left_anti") \
            .write.mode("append").parquet(out_path)

    q = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_once:
        q = q.trigger(availableNow=True)
    return q.start()
