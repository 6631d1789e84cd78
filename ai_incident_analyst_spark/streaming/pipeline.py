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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def streaming_dedup(stream: DataFrame, keys: list[str], ts_col: str = "ts",
                    watermark: str = "1 hour") -> DataFrame:
    """A2 as a stream: bounded-state dedup within the watermark
    (preprocessor.py:30-42's run-scoped dedup, generalized).

    ``dropDuplicatesWithinWatermark``, NOT ``dropDuplicates``: plain
    dropDuplicates only evicts state when the EVENT-TIME column is part
    of the dedup keys — on keys alone its state grows forever (the r12
    sf1 streaming probe measured exactly that: peak state 1,000,000
    rows over a 30-day stream with a 1-hour watermark, i.e. every key
    ever seen). The WithinWatermark variant guarantees duplicates are
    dropped when they arrive within the watermark delay of the first
    sighting and evicts the key afterwards — bounded state, the
    run-scoped-dedup contract this operator promises.

    ARRIVAL-DISORDER CONTRACT (r13): ``watermark`` is the tolerated
    arrival disorder, stated in EVENT time — a row whose ``ts_col``
    lags the maximum event time already ingested by more than the
    watermark delay is DROPPED as late (and a duplicate arriving after
    its key was evicted is re-admitted). A real log tailer satisfies
    the contract by bounding how far its shippers lag each other:
    watermark ≥ (max shipper lag + max clock skew). Drops are
    observable, not silent — Spark counts them per micro-batch in
    ``stateOperators[].numRowsDroppedByWatermark``; use
    ``late_drop_rows(query)`` below to read the total, and size the
    delay from the measured late-drop curve (SCALING.md, r13
    shuffled-arrival cells: the probe's 20-file corpus arriving in
    RANDOM file order needs a watermark near the full corpus span
    before drops reach zero — arrival disorder, not event-time span,
    is what the delay must cover)."""
    return (stream.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(keys))


def late_drop_rows(query) -> int:
    """Total rows dropped as too-late AT THE STATE STORE over the
    query's retained progress history — the observable side of the
    arrival-disorder contract for ``streaming_dedup``
    (dropDuplicatesWithinWatermark evicts/rejects per key at the store,
    so every late arrival lands in this metric; measured r13: 797,776
    of 1M rows under fully shuffled arrival at a 1-hour watermark). Sums
    ``stateOperators[].numRowsDroppedByWatermark`` across
    ``recentProgress`` (complete for availableNow runs; for long-lived
    streams poll per-batch, recentProgress retains ~100 entries).

    NOT valid for ``streaming_count_by_window`` (or any windowed
    aggregation): Spark cuts aggregation late rows with a plain Filter
    on the window column BEFORE the aggregate, so they never reach the
    state store and this metric stays ~0 while rows are silently lost
    (measured r13: 0.0% reported vs real losses under the same shuffled
    arrival). For aggregations, measure COMPLETENESS against a batch
    replay of the same aggregation (tools/streaming_probe.py --disorder
    does exactly that), or emit in update mode and reconcile downstream.
    """
    total = 0
    for p in query.recentProgress:
        for so in (p.get("stateOperators") or []):
            total += int(so.get("numRowsDroppedByWatermark") or 0)
    return total


def streaming_count_by_window(stream: DataFrame, ts_col: str = "ts",
                              window: str = "1 day",
                              watermark: str = "1 day",
                              group_col: str | None = None) -> DataFrame:
    """A4 as a stream: tumbling-window counts with late-data tolerance
    (app.py:22-27's per-day counts).

    Same arrival-disorder contract as ``streaming_dedup``: ``watermark``
    is the tolerated event-time lag behind the max event time seen —
    a window finalizes (emits, in append mode) once the watermark
    passes its end, and rows for already-finalized windows are dropped.
    OBSERVABILITY CAVEAT (measured, r13): those late rows are cut by a
    pre-aggregation Filter on the window column, NOT at the state
    store, so ``numRowsDroppedByWatermark``/``late_drop_rows`` stays ~0
    while data is silently lost. Audit completeness against a batch
    replay of the same aggregation (tools/streaming_probe.py --disorder
    measures the loss curve vs delay), or run update mode and reconcile
    in the sink. Size the delay from the shipper-lag bound, not the
    data's event-time span."""
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


def _swap_pointer(p: str, target: str) -> None:
    """Atomically repoint the constant store path ``p`` (a symlink) at
    the versioned directory ``target`` (same parent dir): build the new
    symlink under a temp name, then rename over ``p`` — rename of a
    symlink onto a symlink is atomic on POSIX, so a reader never sees
    ``p`` missing or dangling."""
    import os

    tmp = p + ".ptr-tmp"
    if os.path.lexists(tmp):
        os.remove(tmp)
    os.symlink(os.path.basename(target), tmp)
    os.rename(tmp, p)


def _recover_store(path: str, grace_seconds: float = 300.0) -> None:
    """Bring a merge-swap store to a clean state: migrate legacy layouts
    (pre-pointer plain directory; a ``.old`` left by the retired
    two-rename protocol) and drop versioned/staged directories the
    pointer does not reference (a crash between pointer flip and
    old-version cleanup, or a write that never flipped). Runs at SINK
    CONSTRUCTION (stream start) as well as per batch, so a crashed store
    heals as soon as the stream restarts — not only when the next batch
    happens to arrive.

    Unreferenced versions are removed only after ``grace_seconds`` of
    age (mtime): a reader that resolved the pointer JUST before a flip
    is still scanning the previous version's files — deleting it at
    flip time failed such readers mid-query (review finding). The grace
    window is the retention contract: readers must complete within it
    (the Delta/Iceberg VACUUM-retention idea at miniature scale)."""
    import glob
    import os
    import shutil
    import time

    p = path.rstrip("/")
    old = p + ".old"
    # legacy two-rename crash: store missing, previous version in .old
    if not os.path.lexists(p) and os.path.exists(old):
        os.rename(old, p)
    # legacy plain-directory store → versioned dir + pointer
    if os.path.exists(p) and not os.path.islink(p):
        v0 = p + ".v-migrated"
        shutil.rmtree(v0, ignore_errors=True)
        os.rename(p, v0)
        _swap_pointer(p, v0)
    cur = os.path.realpath(p) if os.path.islink(p) else None
    now = time.time()
    for d in glob.glob(p + ".v*") + glob.glob(p + ".stage-*") + [old]:
        if not os.path.exists(d) or os.path.realpath(d) == cur:
            continue
        try:
            age = now - os.path.getmtime(d)
        except OSError:
            continue
        if age >= grace_seconds:
            shutil.rmtree(d, ignore_errors=True)


def _merge_swap_sink(stream: DataFrame, path: str, checkpoint: str,
                     build_batch, merge_with_stored):
    """Shared incremental-merge sink protocol: per micro-batch, build a
    batch-local partial, merge it with the stored table, write a NEW
    VERSIONED directory, and atomically flip a constant symlink pointer
    at ``path`` onto it. Used by ``streaming_rollup_sink`` and
    ``streaming_histogram_sink`` — the swap/retry logic lives ONCE here.

    Readers always resolve ``path`` to a complete store: the pointer
    flip is a single symlink rename, so there is NO window where the
    path is missing mid-commit (the previous protocol's two-rename swap
    had one, and a dashboard polling the rollup table would hit
    file-not-found on every batch). Superseded versions are retained
    for a GC grace window (``_recover_store``) so an in-flight reader
    of the previous version finishes cleanly; readers slower than the
    grace window need a real table format (see below).

    At-least-once safety (foreachBatch may replay a batch):

    * an ``_APPLIED_BATCH_<id>`` marker file is written INSIDE the
      versioned directory before the flip, so it travels with the
      pointer — a replayed batch whose flip already landed sees its own
      marker through ``path`` and skips, instead of double-merging;
    * a crash at ANY point leaves the pointer on the last complete
      version; ``_recover_store`` (at stream start and per batch) just
      garbage-collects unreferenced version dirs.

    Local-FS symlink semantics; production object-store deployments want
    a table format with transactional commit (Delta/Iceberg) here.
    """
    import os

    spark = stream.sparkSession
    p = path.rstrip("/")
    # heal a crashed store as soon as the stream is (re)built, not only
    # when the next micro-batch arrives
    _recover_store(p)

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        _recover_store(p)
        # replay guard: this batch's flip already landed
        if os.path.exists(os.path.join(p, f"_APPLIED_BATCH_{batch_id}")):
            return
        batch_part = build_batch(batch_df)
        if os.path.exists(p):
            merged = merge_with_stored(spark.read.parquet(p), batch_part)
        else:
            merged = batch_part
        staged = p + f".v{batch_id}"
        merged.write.mode("overwrite").parquet(staged)
        open(os.path.join(staged, f"_APPLIED_BATCH_{batch_id}"), "w").close()
        _swap_pointer(p, staged)
        # the superseded version is NOT deleted here: a reader that
        # resolved the pointer moments ago is still scanning it.
        # _recover_store garbage-collects it once it ages past the
        # grace window (next batches / next stream start).

    return (
        stream.writeStream
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(merge_batch)
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
    Swap/retry protocol: ``_merge_swap_sink``.
    """
    from ..operators.rollup import build_rollup, merge_rollups

    return _merge_swap_sink(
        stream, path, checkpoint,
        lambda b: build_rollup(b, ts_col, dims, value_col, bucket),
        lambda stored, part: merge_rollups(stored, part, value_col))


def streaming_histogram_sink(stream: DataFrame, path: str, checkpoint: str,
                             group_cols: list[str], value_col: str,
                             lo: float, hi: float, buckets: int = 400):
    """Streaming QUANTILES: maintain the mergeable fixed-grid histogram
    sketch (``operators/sketch.histogram_sketch_*``) incrementally —
    each micro-batch builds its own bucket counts and merges them into
    the stored sketch by summing matching buckets. Readers interpolate
    any quantile from ``path`` (``histogram_sketch_quantile``) without
    touching the stream or raw history — the non-additive measure
    ``streaming_rollup_sink`` couldn't maintain. Swap/retry protocol:
    ``_merge_swap_sink``.
    """
    from ..operators.sketch import (
        histogram_sketch_build,
        histogram_sketch_merge,
    )

    return _merge_swap_sink(
        stream, path, checkpoint,
        lambda b: histogram_sketch_build(b, group_cols, value_col,
                                         lo, hi, buckets),
        lambda stored, part: histogram_sketch_merge(
            stored.unionByName(part), group_cols))


def streaming_index_dedup_sink(stream: DataFrame, index_path: str,
                               out_path: str, checkpoint: str,
                               id_col: str, text_col: str,
                               num_perm: int = 64, bands: int = 16,
                               n: int = 3, threshold: float = 0.5,
                               hash_fn: str = "xxhash64",
                               trigger_once: bool = True):
    """Streaming ingest deduplicated against the PERSISTED corpus MinHash
    index: each micro-batch (a) drops its own within-batch near-dups
    (keep-smallest-id via ``minhash_lsh_neardup`` over the batch), then
    (b) probes ``operators/dedup.minhash_probe_index`` and keeps only
    docs with no near-dup in the corpus. Survivors land in a
    per-batch-id subdirectory written with overwrite, so a replayed
    batch rewrites the same directory instead of appending duplicates
    (foreachBatch is at-least-once). Unlike
    ``stateful.streaming_neardup_gate`` (state-store LSH, within-stream
    dups), this gate checks the full historical corpus without
    re-shingling it and survives restarts because the index is on disk.

    The on-disk index is NOT updated per batch: duplicate content
    arriving in two different micro-batches both passes until the
    periodic index rebuild (``minhash_write_index`` over corpus +
    accepted output — the compaction step this sink expects).
    """
    from ..operators.dedup import minhash_lsh_neardup, minhash_probe_index

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_df.isEmpty():
            return
        batch_df = batch_df.localCheckpoint(eager=False)
        # (a) within-batch self-dedup: for every near-dup pair keep the
        # smaller id (pairs are emitted id_a < id_b, so drop every id_b)
        self_pairs = minhash_lsh_neardup(
            batch_df, id_col, text_col, num_perm=num_perm, bands=bands,
            n=n, threshold=threshold, hash_fn=hash_fn) \
            .select(F.col("id_b").alias(id_col)).distinct()
        batch_df = batch_df.join(self_pairs, id_col, "left_anti")
        # (b) corpus gate
        hits = minhash_probe_index(
            spark, index_path, batch_df, id_col, text_col,
            num_perm=num_perm, bands=bands, n=n, threshold=threshold,
            hash_fn=hash_fn).select(F.col("new_id").alias(id_col)).distinct()
        batch_df.join(hits, id_col, "left_anti") \
            .write.mode("overwrite") \
            .parquet(f"{out_path}/batch_id={batch_id}")

    q = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_once:
        q = q.trigger(availableNow=True)
    return q.start()


def streaming_cms_sink(stream: DataFrame, path: str, checkpoint: str,
                       key_col: str, depth: int = 4, width: int = 1024):
    """Streaming HEAVY HITTERS: maintain a Count-Min sketch
    (``operators/sketch.cms_*``) incrementally — each micro-batch builds
    its own ``(row, col, cnt)`` cells and merges them into the stored
    sketch by summing matching cells. A dashboard answers "how many
    times has key X occurred, ever" from ``path`` via ``cms_estimate``
    in O(depth·width) regardless of stream volume — the per-key exact
    counter table would be unbounded state; the sketch is a fixed
    4 KB-ish table forever. Swap/retry protocol: ``_merge_swap_sink``.
    """
    from ..operators.sketch import cms_build, cms_merge

    return _merge_swap_sink(
        stream, path, checkpoint,
        lambda b: cms_build(b, key_col, depth, width),
        lambda stored, part: cms_merge(stored, part))


def streaming_decay_sink(stream: DataFrame, path: str, checkpoint: str,
                         key: str, ts_col: str, value_col: str,
                         half_life_seconds: float):
    """Streaming RECENCY SCORES: maintain per-key exponential-decay sums
    (``operators/temporal.decayed_agg``) incrementally. The store keeps
    ``(key, decayed_sum, ref_ts)`` — each key's sum anchored at its own
    latest event time; merging a new batch re-anchors both sides at the
    later reference (``sum · 0.5^(Δref/half_life)``) and adds. This is
    the decay algebra that makes the score maintainable without
    reprocessing history — the recommendation-pipeline "recent user
    activity" feature kept fresh forever in O(keys) state. Swap/retry
    protocol: ``_merge_swap_sink``.
    """
    hl = float(half_life_seconds)

    def build(b: DataFrame) -> DataFrame:
        ref = F.max(F.col(ts_col)).over(Window.partitionBy(key))
        return (
            b.withColumn("__ref", ref)
            .groupBy(key)
            .agg(
                F.sum(F.col(value_col).cast("double")
                      * F.pow(F.lit(0.5),
                              (F.col("__ref").cast("double")
                               - F.col(ts_col).cast("double")) / F.lit(hl)))
                .alias("decayed_sum"),
                F.max(F.col(ts_col)).alias("ref_ts"),
            )
        )

    def merge(stored: DataFrame, part: DataFrame) -> DataFrame:
        s = stored.select(F.col(key), F.col("decayed_sum").alias("__s"),
                          F.col("ref_ts").alias("__sr"))
        p = part.select(F.col(key), F.col("decayed_sum").alias("__p"),
                        F.col("ref_ts").alias("__pr"))
        j = s.join(p, key, "full_outer")
        new_ref = F.greatest(F.col("__sr"), F.col("__pr"))
        def aligned(sum_c, ref_c):
            return F.coalesce(
                F.col(sum_c) * F.pow(
                    F.lit(0.5),
                    (new_ref.cast("double") - F.col(ref_c).cast("double"))
                    / F.lit(hl)),
                F.lit(0.0))
        return j.select(
            key,
            (aligned("__s", "__sr") + aligned("__p", "__pr"))
            .alias("decayed_sum"),
            new_ref.alias("ref_ts"),
        )

    return _merge_swap_sink(stream, path, checkpoint, build, merge)


def streaming_index_sink(stream: DataFrame, path: str, checkpoint: str,
                         id_col: str, text_col: str):
    """Streaming SEARCH INDEX: maintain the inverted index
    (``operators/search.build_inverted_index``) incrementally — each
    micro-batch contributes its (term, doc_id, tf) postings, merged into
    the store by tf sum (re-ingested doc ids accumulate; pair with the
    dedup gate upstream if exactly-once per doc matters). Keyword/BM25
    queries hit ``path`` without touching the stream — the text sibling
    of ``streaming_cms_sink``. Swap/retry protocol: ``_merge_swap_sink``.
    """
    from ..operators.search import build_inverted_index

    return _merge_swap_sink(
        stream, path, checkpoint,
        lambda b: build_inverted_index(b, id_col, text_col),
        lambda stored, part: (
            stored.unionByName(part)
            .groupBy("term", "doc_id").agg(F.sum("tf").alias("tf"))))


def streaming_scd2_sink(stream: DataFrame, path: str, checkpoint: str,
                        key: str, ts_col: str, attrs: list[str],
                        order_col: str):
    """Streaming DIMENSION MAINTENANCE: keep the SCD2 version table
    (``operators/scd.scd2_apply``) current as changes arrive. Per batch,
    only the touched keys are reassembled: their stored versions are
    converted back to change rows (``valid_from`` is the change time —
    the inverse of interval assembly), unioned with the batch's changes,
    and re-run through ``scd2_apply``; untouched keys pass through
    byte-identical. Point-in-time joins read ``path`` at any moment.
    State is the dimension itself — O(versions), no raw-history replay.
    Swap/retry protocol: ``_merge_swap_sink``.

    CONTRACT (the standard CDC ordering assumption): change events
    arrive in per-key NONDECREASING event time across batches — a batch
    may be internally unordered (reassembly fixes it), but a change
    older than a key's stored newest version cannot be merged, because
    no-op collapse is lossy: a collapsed run of identical values cannot
    be re-split when a late row lands inside it. Late rows RAISE
    (fail-loud, per repo policy) — route late data through a batch
    rebuild from the full change log instead. ``order_col`` breaks
    same-instant ties within a batch; across batches the later batch
    wins a same-instant tie (its change supersedes the stored version,
    matching last-arrival-wins over the full log).
    """
    from ..operators.scd import scd2_apply

    def build(b: DataFrame) -> DataFrame:
        # the batch partial IS an assembled SCD2 table, so the store is
        # SCD2-shaped from the very first batch (the no-store branch of
        # _merge_swap_sink persists build() output directly)
        return scd2_apply(b.select(key, ts_col, *attrs, order_col),
                          key, ts_col, attrs, order_col=order_col)

    def merge(stored: DataFrame, part: DataFrame) -> DataFrame:
        touched = part.select(key).distinct()
        untouched = stored.join(touched, key, "left_anti")
        # fail-loud late-data guard: a batch change strictly older than
        # the key's newest stored version would land inside collapsed
        # history and silently mis-assemble
        newest = (stored.groupBy(key)
                  .agg(F.max("valid_from").alias("__newest")))
        n_late = (part.join(newest, key)
                  .filter(F.col("valid_from") < F.col("__newest"))
                  .count())
        if n_late:
            raise ValueError(
                f"streaming_scd2_sink: {n_late} change(s) arrived with "
                "event time older than the stored current version — "
                "out-of-order beyond the CDC contract; rebuild the "
                "dimension from the full change log instead")
        # versions -> change rows (valid_from is the change instant) for
        # the touched keys, then one re-assembly. Ordinals are sentinel:
        # stored replays at -1, the batch at 0 — a NEWER batch's change
        # at the same instant must beat the stored version (exactly what
        # the one-shot assembly's last-arrival-wins rule does, because
        # live ordinals are monotone across batches); ties WITHIN a
        # batch were already resolved by build()'s own assembly.
        def replay(scd, ordv):
            return scd.join(touched, key, "left_semi").select(
                key, F.col("valid_from").alias(ts_col), *attrs,
                F.lit(ordv).alias(order_col))

        merged = scd2_apply(
            replay(stored, -1).unionByName(replay(part, 0)),
            key, ts_col, attrs, order_col=order_col)
        return untouched.unionByName(merged)

    return _merge_swap_sink(stream, path, checkpoint, build, merge)


def streaming_ivf_sink(stream: DataFrame, path: str, checkpoint: str,
                       centroids: DataFrame,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       centroid_id: str = "centroid_id",
                       centroid_vec: str = "centroid",
                       round_dp: int | None = None):
    """Streaming VECTOR index: maintain the persisted IVF inverted file
    (``operators/knn.ivf_write_index`` layout) incrementally — the
    FAISS ``index.add`` loop as a stream sink, and the vector sibling of
    ``streaming_index_sink``.

    Centroids are FIXED (trained once, offline — ``clustering.
    kmeans_fit`` — exactly how production FAISS deployments add forever
    to a once-trained coarse quantizer; incremental retraining would
    silently remap cells and invalidate every previously written list).
    Each micro-batch runs the zero-shuffle ``assign_cells`` Arrow pass
    and lands in ``path/__cell=<c>/__batch=<b>/`` — the batch's rows
    only, O(batch) work regardless of corpus size, never a store
    rewrite (the growing-corpus reason this does NOT use
    ``_merge_swap_sink``, whose per-batch full rewrite is right for
    fixed-size aggregates only).

    ``ivf_probe_index`` reads the store unchanged: ``__cell`` stays the
    leading partition directory, so static-IN probe pruning skips
    unprobed cells at planning time; the inner ``__batch=`` level adds
    at-least-once safety — a replayed batch dynamically overwrites ITS
    OWN (cell, batch) partitions instead of appending duplicates, and
    commits no marker files a reader could trip on.
    """
    import os

    from ..operators.knn import _centroid_arrays, assign_cells

    ids, mat, ctype = _centroid_arrays(centroids, centroid_id, centroid_vec)
    p = path.rstrip("/")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        assigned = (
            assign_cells(batch_df.select(id_col, vec_col), vec_col, ids,
                         mat, n=1, cell_type=ctype, round_dp=round_dp)
            .withColumn("__batch", F.lit(int(batch_id)))
            .repartition(F.col("__cell")))
        # Concurrent-compaction safety: write into the RESOLVED version
        # directory, then revalidate the pointer. If compact_ivf_store
        # flipped the pointer mid-write, this batch landed in the
        # superseded version (compaction's snapshot may not contain it,
        # and _recover_store GCs that directory after the grace window)
        # — so retry through the new pointer. The rewrite is idempotent:
        # dynamic partition overwrite replaces exactly this batch's own
        # (cell, batch) partitions, including any partial rescue copies
        # compaction carried over (see compact_ivf_store).
        for _ in range(5):
            target = os.path.realpath(p) if os.path.islink(p) else p
            (assigned
             .write.partitionBy("__cell", "__batch")
             .option("partitionOverwriteMode", "dynamic")
             .mode("overwrite").parquet(target))
            now = os.path.realpath(p) if os.path.islink(p) else p
            if now == target:
                return
        raise RuntimeError(
            "streaming_ivf_sink: store pointer kept moving during batch "
            f"{batch_id} commit (5 retries) — a compactor is flipping "
            "the pointer continuously; throttle compaction")

    return (
        stream.writeStream
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(write_batch)
    )


def compact_ivf_store(spark, path: str) -> None:
    """Maintenance companion of ``streaming_ivf_sink``: fold the
    accumulated per-batch partitions into one ``__batch=-1`` partition
    per cell. A long-running stream leaves one directory (and >=1 small
    file) per (cell, batch); probes prune on ``__cell`` but still open
    every batch file inside each probed cell, so read amplification
    grows linearly with stream age. Compaction restores O(1) files per
    cell while keeping the two-level ``__cell=/__batch=`` layout —
    partition discovery requires uniform depth, so the compacted rows
    keep a reserved batch id rather than collapsing to one level.

    Reader safety uses the store's pointer protocol: the compacted
    store is written to a fresh versioned directory and a symlink flip
    makes it live atomically (``_swap_pointer``; a plain directory from
    direct sink writes is migrated first by ``_recover_store``).

    Safe against a LIVE ``streaming_ivf_sink`` (no quiesce needed):

    * the batch-id set is SNAPSHOTTED before reading and only those
      batches are folded into ``__batch=-1`` — the compacted output is
      a deterministic set, whatever lands mid-compaction;
    * after the flip, batch partitions that appeared in the old version
      AFTER the snapshot (a batch committed between read and flip) are
      rescued — copied as-is into the live version, so no committed
      micro-batch is ever lost to the old directory's GC;
    * a batch still mid-write at flip time revalidates the pointer in
      ``write_batch`` and rewrites itself through the new pointer
      (idempotent dynamic overwrite replaces any partial rescue copy).

    Contract: do NOT reset the stream's checkpoint after compacting —
    a replayed batch id whose rows were folded into ``__batch=-1``
    would re-add them (its own partition overwrite can no longer see
    them). Same reprocessing caveat as any log-structured compaction.
    Single compactor at a time (it is a maintenance job, not a sink).
    """
    import glob
    import os
    import shutil

    p = path.rstrip("/")
    _recover_store(p)
    cur = os.path.realpath(p) if os.path.islink(p) else p

    def batch_dirs(version_dir):
        out = {}
        for d in glob.glob(os.path.join(version_dir, "__cell=*",
                                        "__batch=*")):
            b = int(d.rsplit("=", 1)[1])
            out.setdefault(b, []).append(d)
        return out

    # snapshot FIRST; compact exactly this set (partition pruning on
    # __batch keeps the scan to the snapshot even if new dirs appear)
    snap = batch_dirs(cur)
    snap_ids = list(snap)
    n = 0
    while os.path.exists(f"{p}.v-compact-{n}"):
        n += 1
    staged = f"{p}.v-compact-{n}"
    (spark.read.parquet(cur)
     .where(F.col("__batch").isin(snap_ids))
     .withColumn("__batch", F.lit(-1))
     .repartition(F.col("__cell"))
     .write.partitionBy("__cell", "__batch")
     .mode("overwrite").parquet(staged))
    _swap_pointer(p, staged)
    # rescue: batches committed into the old version between snapshot
    # and flip. Copy (never move — an in-flight reader may still be
    # scanning the old version within the GC grace window), skipping
    # uncommitted task temp dirs; a batch mid-write rescues partially
    # here and then rewrites itself completely via write_batch's
    # pointer revalidation.
    for b, dirs in batch_dirs(cur).items():
        if b in snap:
            continue
        for d in dirs:
            cell = os.path.basename(os.path.dirname(d))
            dst = os.path.join(staged, cell, f"__batch={b}")
            shutil.copytree(
                d, dst, dirs_exist_ok=True,
                ignore=shutil.ignore_patterns("_temporary", "_*", ".*"))


def streaming_psi_sink(stream: DataFrame, baseline: DataFrame,
                       value_col: str, path: str, checkpoint: str,
                       n_bins: int = 10):
    """Streaming drift monitor: maintain the CURRENT window's bin-count
    table for ``operators/divergence.psi_report`` semantics against a
    FIXED baseline — the production deployment shape of PSI, where the
    baseline is a frozen training-time snapshot and the monitored
    distribution arrives as a stream.

    At sink construction the baseline's interpolated quantile grid is
    computed ONCE (one tiny aggregate, collected — n_bins−1 doubles)
    and frozen into the sink, exactly like the IVF sink freezes its
    centroids: re-deriving the grid per batch would silently re-anchor
    the monitor and hide drift. Each micro-batch collapses map-side to
    ≤``n_bins`` bin-count rows merged into the store by sum
    (``_merge_swap_sink`` swap/retry + replay-guard protocol) — O(bins)
    state forever, the stream is never reprocessed.

    Read side: ``psi_from_store`` recomputes the report from the store
    at any moment; streamed-then-scored equals the one-shot batch
    ``psi_report`` by the additivity of bin counts (identity test).
    """
    from ..operators.divergence import psi_bucket_expr

    bucket = psi_bucket_expr(baseline, value_col, n_bins)

    def build(b: DataFrame) -> DataFrame:
        return (b.select(bucket.alias("bin"))
                .groupBy("bin").agg(F.count("*").alias("n_cur")))

    return _merge_swap_sink(
        stream, path, checkpoint, build,
        lambda stored, part: (
            stored.unionByName(part)
            .groupBy("bin").agg(F.sum("n_cur").alias("n_cur"))))


def psi_from_store(spark, path: str, baseline: DataFrame, value_col: str,
                   n_bins: int = 10, alpha: float = 0.5,
                   round_dp: int = 6) -> DataFrame:
    """The ``psi_report`` frame computed from a ``streaming_psi_sink``
    store — same columns, same 6dp integer-ratio contract."""
    from ..operators.divergence import psi_report_from_counts

    cur = spark.read.parquet(path)
    return psi_report_from_counts(baseline, cur, value_col,
                                  n_bins=n_bins, alpha=alpha,
                                  round_dp=round_dp)
