"""The reference's repeated-run incident loop as ONE streaming job.

Reference behavior: every scheduled run re-fetches the last window of
logs and replays the whole chain — preprocess → dedup → redact → embed →
search prior incidents → LLM RCA → notify → append to history
(``src/main.py:88-92``; the dashboard shows new entries on refresh).
Re-expressed Spark-first: the ``logapi`` SimpleDataSourceStreamReader
paces the fetch windows (offsets are epoch-ms watermarks, one
``batch_ms`` window per micro-batch — sources/logapi.py:270), and each
micro-batch runs the SAME per-batch composition the batch e2e drives
(tests/test_incident_e2e.py), appending one day-partitioned history
entry per non-empty window.

Why ``foreachBatch`` and not a pure streaming DAG: the loop body needs
batch-only operators (global sort for ``pick_batch``, a k-NN broadcast
join, one driver-side LLM call per batch) — exactly the
micro-batch-as-batch escape hatch ``foreachBatch`` exists for.

Restart semantics: processed-window offsets live in the checkpoint, so
a killed and restarted job resumes at the first unprocessed window and
history gains exactly the missing entries — the incremental==batch
identity proven by ``tests/test_incident_loop.py`` (stream run with a
mid-stream restart vs per-window batch replay of
``process_incident_batch`` produce identical history tables).

At scale: each micro-batch is one bounded remote fetch; the corpus side
of the k-NN is a broadcast of the (bounded) prior-incident index; the
history append is a day-partitioned parquet write — no unbounded state
lives in the stream itself, so the job's memory footprint is
independent of how long it has been running.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.redaction import DEFAULT_PATTERNS, LLM_SIDE_PATTERNS, redact
from ..operators.dedup import dedup_keep_first
from ..operators.embedding import embed_text
from ..operators.knn import knn_join
from ..operators.rag import (
    append_history_partitioned,
    pick_batch,
    run_rag_batch,
)


def process_incident_batch(batch: DataFrame, corpus: DataFrame,
                           llm_fn: Callable[[str], str],
                           history_path: str,
                           notify_fn: Optional[Callable[[str], bool]] = None,
                           batch_size: int = 100, k: int = 1,
                           dim: int = 32) -> Optional[str]:
    """One reference main-loop iteration over an already-fetched batch.

    ``batch`` carries the logapi schema (epoch-ms ``timestamp``,
    ``level``, ``container_name``, ``message``); ``corpus`` is the
    prior-incident index ``(hist_id, embedding)``. Returns the LLM
    output, or None for an empty batch (no history entry — the
    reference skips runs that fetch nothing). Shared verbatim by the
    streaming loop and the batch replay so incremental == batch is an
    identity by construction.
    """
    if batch.isEmpty():
        return None
    arr = batch.withColumn("__arrival", F.monotonically_increasing_id())
    deduped = dedup_keep_first(arr, ["message", "timestamp"],
                               "__arrival").drop("__arrival")
    clean = deduped.withColumn(
        "message", redact("message", DEFAULT_PATTERNS + LLM_SIDE_PATTERNS))
    picked = pick_batch(embed_text(clean, ["message", "level"], dim=dim),
                        batch_size, "timestamp")
    q = picked.select(
        F.monotonically_increasing_id().alias("query_id"),
        F.col("embedding").alias("query_vec"))
    hits = knn_join(q, corpus, k=k, metric="cosine",
                    corpus_id="hist_id", corpus_vec="embedding")
    similar = corpus.join(
        hits.select(F.col("vec_id").alias("hist_id")).distinct(), "hist_id")
    # ISO timestamp for the entry row: day-partitions the history sink
    # and matches the reference's string timestamps (main.py:79-87)
    entry_src = (
        picked.drop("embedding")
        .withColumnRenamed("timestamp", "__ts_ms")
        .withColumn("timestamp", F.date_format(
            F.timestamp_millis(F.col("__ts_ms")),
            "yyyy-MM-dd'T'HH:mm:ss'Z'"))
        .drop("__ts_ms")
    )
    entry, llm_out = run_rag_batch(entry_src, similar, llm_fn, notify_fn)
    # namespace_name rides along so the stored table feeds the dashboard
    # surfaces (history_filter / history_metrics) unmodified
    append_history_partitioned(
        entry.select("timestamp", "container_name", "namespace_name",
                     "level", "batch_logs", "similar_logs", "llm_output",
                     "feedback"),
        history_path)
    return llm_out


def incident_stream(spark, source_options: dict, corpus: DataFrame,
                    history_path: str, checkpoint: str,
                    llm_fn: Callable[[str], str],
                    notify_fn: Optional[Callable[[str], bool]] = None,
                    batch_size: int = 100, k: int = 1, dim: int = 32):
    """The full streaming incident loop; returns an un-started
    ``DataStreamWriter`` (callers ``.start()`` it, tests drive it with
    the poll-and-stop pattern of tests/test_logapi_source.py).

    ``source_options`` are the logapi reader options (fixture or real
    transport, since/until window, ``batch_ms`` pacing).
    """
    import os

    from ..sources.logapi import LogApiDataSource

    spark.dataSource.register(LogApiDataSource)
    stream = (spark.readStream.format("logapi")
              .options(**source_options).load())

    # foreachBatch is at-least-once: a batch whose history append landed
    # but whose offset commit didn't gets REPLAYED after a restart, so
    # the sink must be idempotent per batch_id. A marker file under the
    # checkpoint (same lifetime as the offsets) records "this batch's
    # entry is already in history"; production against an object store
    # would use a transactional table (Delta/Iceberg MERGE on batch_id)
    # for the same contract.
    marker_dir = os.path.join(checkpoint, "history_markers")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        os.makedirs(marker_dir, exist_ok=True)
        marker = os.path.join(marker_dir, f"batch-{batch_id}")
        if os.path.exists(marker):
            return
        out = process_incident_batch(batch_df, corpus, llm_fn,
                                     history_path, notify_fn=notify_fn,
                                     batch_size=batch_size, k=k, dim=dim)
        with open(marker, "w") as f:
            f.write("" if out is None else "entry")

    return (stream.writeStream.outputMode("append")
            .option("checkpointLocation", checkpoint)
            .foreachBatch(process))
