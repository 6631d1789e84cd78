"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no stateful streaming — its "state" is the append-only
history file re-read per request (app.py:47-60) and the run-scoped dedup
set (preprocessor.py:30-42). These operators are the mandated
beyond-reference surface: per-key state that survives across micro-batches
with explicit timeout semantics, the Structured Streaming analog of the
batch ``operators.temporal.sessionize`` / incident-burst metrics.

Scale design: state is partitioned by the grouping key across executors
(one shuffle per micro-batch on the key), held in the state store with
incremental checkpoints. Arrow batches cross the Python boundary once per
(key, trigger). Keys that stay silent are reaped via ProcessingTimeTimeout
so state size tracks the *active* key set, not the all-time key set.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)


#: state-schema versions, one per stateful operator. Bump when the state
#: tuple's layout OR semantics change. v1 was the unversioned tuple; v2
#: (r9) prepends this version field so a restart over a checkpoint from
#: an incompatible operator version fails FAST with an actionable
#: message instead of an opaque deep-in-the-plan error (advice r8: the
#: conversations migration note relied on opaque failure).
_STATE_VERSIONS = {
    "streaming_sessionize": 2,
    "streaming_burst_monitor": 2,
    "streaming_neardup_gate": 2,
    # v2 was the r8 sort-at-emit state (ts_us added); v3 adds the guard
    "streaming_conversations": 3,
}


def _check_state_version(got: int, expected: int, op: str) -> None:
    """Fail fast when a resumed checkpoint holds state written by an
    incompatible operator version. Spark's own state-store schema check
    catches LAYOUT changes; this catches same-shape SEMANTIC changes
    (e.g. a field's meaning or ordering contract changed) that would
    otherwise corrupt silently or crash opaquely. ``expected`` is
    captured BY VALUE in each operator's closure at plan-build time
    (the serialized UDF carries it to the Python workers; a module
    global would be re-imported worker-side and ignore runtime pins).
    """
    if got != expected:
        raise ValueError(
            f"{op}: state-schema version mismatch — the checkpoint holds "
            f"v{got} state but this operator version writes v{expected}. "
            f"The stream was restarted over a checkpoint written by an "
            f"incompatible operator version; restart with a FRESH "
            f"checkpoint location and replay the source (the standard "
            f"Structured Streaming contract for state-schema changes).")


def streaming_sessionize(stream: DataFrame, key: str = "user_id",
                         ts_col: str = "ts",
                         gap_seconds: int = 1800,
                         state_timeout_ms: int = 0) -> DataFrame:
    """Assign gap-based session ids to a stream, continuing across triggers.

    Same semantics as the batch ``sessionize`` (new session when the gap
    since the key's previous event exceeds ``gap_seconds``), but the
    (last_ts, session counter) per key lives in the state store, so a
    session spanning two micro-batches keeps one id. Events are ordered by
    ``ts_col`` *within* each trigger; cross-trigger out-of-order events
    older than the key's high-water mark start no new session (they join
    the current one — the streaming relaxation of the batch total order).

    Output: (key, ts, session_id) append stream.
    """
    out_schema = StructType([
        StructField(key, LongType()),
        StructField(ts_col, TimestampType()),
        StructField("session_id", LongType()),
    ])
    state_schema = StructType([
        StructField("schema_ver", LongType()),
        StructField("last_ts_epoch", LongType()),
        StructField("sid", LongType()),
    ])

    state_ver = _STATE_VERSIONS["streaming_sessionize"]

    def assign(key_tuple: Any, pdfs: Iterable[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            ver, last_ts, sid = state.get
            _check_state_version(ver, state_ver, "streaming_sessionize")
        else:
            last_ts, sid = None, 0
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(ts_col)
            epochs = (pdf[ts_col].astype("int64") // 1_000_000_000).to_numpy()
            sids = []
            for e in epochs:
                if last_ts is None or e - last_ts > gap_seconds:
                    sid += 1
                if last_ts is None or e > last_ts:
                    last_ts = int(e)
                sids.append(sid)
            yield pd.DataFrame({
                key: [key_tuple[0]] * len(pdf),
                ts_col: pdf[ts_col],
                "session_id": sids,
            })
        state.update((state_ver,
                      last_ts, sid))
        if state_timeout_ms > 0:
            state.setTimeoutDuration(state_timeout_ms)

    timeout = (GroupStateTimeout.ProcessingTimeTimeout if state_timeout_ms > 0
               else GroupStateTimeout.NoTimeout)
    return stream.groupBy(key).applyInPandasWithState(
        assign, out_schema, state_schema, "append", timeout)


def streaming_burst_monitor(stream: DataFrame, key: str = "container_name",
                            ts_col: str = "ts",
                            threshold: int = 10,
                            state_timeout_ms: int = 0) -> DataFrame:
    """Per-key cumulative event counter that flags bursts.

    Emits one row per (key, trigger): the key's all-time event count so far
    and whether THIS trigger alone crossed ``threshold`` events (the
    incident-storm signal the reference approximates by re-counting the
    whole history per dashboard request, app.py:22-33 — here it is O(new
    events) per trigger with O(active keys) state).
    """
    out_schema = StructType([
        StructField(key, LongType()),
        StructField("events_total", LongType()),
        StructField("events_this_trigger", LongType()),
        StructField("burst", LongType()),
    ])
    state_schema = StructType([StructField("schema_ver", LongType()),
                               StructField("total", LongType())])

    state_ver = _STATE_VERSIONS["streaming_burst_monitor"]

    def monitor(key_tuple: Any, pdfs: Iterable[pd.DataFrame],
                state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            ver, total = state.get
            _check_state_version(ver, state_ver, "streaming_burst_monitor")
        else:
            total = 0
        n = 0
        for pdf in pdfs:
            n += len(pdf)
        total += n
        state.update((state_ver, total))
        if state_timeout_ms > 0:
            state.setTimeoutDuration(state_timeout_ms)
        yield pd.DataFrame({
            key: [key_tuple[0]],
            "events_total": [total],
            "events_this_trigger": [n],
            "burst": [1 if n >= threshold else 0],
        })

    timeout = (GroupStateTimeout.ProcessingTimeTimeout if state_timeout_ms > 0
               else GroupStateTimeout.NoTimeout)
    return stream.groupBy(key).applyInPandasWithState(
        monitor, out_schema, state_schema, "update", timeout)


def streaming_neardup_gate(stream: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text",
                           num_perm: int = 32, bands: int = 8,
                           n: int = 3, threshold: float = 0.5,
                           max_sigs_per_bucket: int = 64,
                           state_timeout_ms: int = 0) -> DataFrame:
    """Streaming MinHash-LSH near-dup gate: flag incoming documents whose
    estimated Jaccard vs ANY previously-seen document in a shared LSH
    bucket exceeds ``threshold`` — the corpus-ingestion filter that batch
    ``minhash_lsh_neardup`` provides offline, continuously.

    Plan per micro-batch: signatures are computed with the SAME banding
    as the batch operator (xxhash64 permutations, JVM-side), exploded to
    one row per (band bucket, doc), then ``applyInPandasWithState`` keyed
    by bucket compares newcomers against the bucket's stored signatures
    and appends them. A doc sharing several buckets is flagged if any
    bucket matches; the caller dedups flags with a groupBy-max on doc id
    (emitted per bucket, ``is_neardup`` = max).

    State per bucket is capped at ``max_sigs_per_bucket`` signatures
    (FIFO): LSH buckets are ~uniform under the band hash, so a bucket
    accumulating beyond the cap means a pathological hot bucket — the cap
    bounds state instead of letting one bucket absorb the stream. Idle
    buckets are reaped by ProcessingTimeTimeout when
    ``state_timeout_ms`` > 0.

    Output: append stream (bucket, doc, is_neardup, est_jaccard) — one
    row per (bucket, doc); aggregate per doc downstream.
    """
    import numpy as np

    from pyspark.sql import functions as F

    assert num_perm % bands == 0
    r = num_perm // bands

    # The batch operator's explode + groupBy-min would be a STREAMING
    # AGGREGATION (needs a watermark, breaks append mode); but a MinHash
    # signature is a pure function of one row's text, so compute it as a
    # per-row column expression instead: shingle (HOF), hash each gram
    # once into a materialized array column, then each permutation is an
    # array_min over a rehash. Values are IDENTICAL to the batch
    # minhash_signature (min over xxhash64(i, xxhash64(gram))) — a
    # streaming gate and an offline minhash_lsh_neardup sweep agree.
    # Docs with fewer than n tokens have no shingles and pass untested.
    from ..operators.dedup import hashed_shingles, minhash_signature_cols

    hashed = stream.select(
        F.col(id_col).alias("doc"),
        hashed_shingles(F.col(text_col), n).alias("hs"),
    ).filter(F.size("hs") > 0)
    sig = hashed.select("doc", *minhash_signature_cols("hs", num_perm))
    band_arr = F.expr("array(" + ", ".join(
        f"xxhash64({b}, " + ", ".join(f"h{b * r + j}" for j in range(r)) + ")"
        for b in range(bands)) + ")")
    sig_arr = F.expr(
        "array(" + ", ".join(f"h{i}" for i in range(num_perm)) + ")")
    buckets = sig.select(
        "doc", sig_arr.alias("sig"),
        F.explode(band_arr).alias("bucket"))

    from pyspark.sql.types import (
        ArrayType,
        BooleanType,
        DoubleType,
        StructField,
        StructType,
    )
    out_schema = StructType([
        StructField("bucket", LongType()),
        StructField("doc", LongType()),
        StructField("is_neardup", BooleanType()),
        StructField("est_jaccard", DoubleType()),
    ])
    state_schema = StructType([
        StructField("schema_ver", LongType()),
        StructField("sigs", ArrayType(ArrayType(LongType()))),
    ])

    state_ver = _STATE_VERSIONS["streaming_neardup_gate"]

    def gate(key_tuple: Any, pdfs: Iterable[pd.DataFrame],
             state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            ver, sigs0 = state.get
            _check_state_version(ver, state_ver, "streaming_neardup_gate")
            stored: list[list[int]] = list(sigs0)
        else:
            stored = []
        bucket = key_tuple[0]
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values("doc")
            docs = pdf["doc"].to_numpy()
            sigs = np.array(list(pdf["sig"]), dtype=np.int64)
            flags, bests = [], []
            for i in range(len(docs)):
                best = 0.0
                if stored:
                    mat = np.asarray(stored, dtype=np.int64)
                    best = float((mat == sigs[i]).mean(axis=1).max())
                flags.append(best >= threshold)
                bests.append(best)
                stored.append([int(x) for x in sigs[i]])
                if len(stored) > max_sigs_per_bucket:
                    stored = stored[-max_sigs_per_bucket:]
            yield pd.DataFrame({
                "bucket": [bucket] * len(docs),
                "doc": docs,
                "is_neardup": flags,
                "est_jaccard": [round(b, 6) for b in bests],
            })
        state.update((state_ver,
                      stored))
        if state_timeout_ms > 0:
            state.setTimeoutDuration(state_timeout_ms)

    timeout = (GroupStateTimeout.ProcessingTimeTimeout
               if state_timeout_ms > 0 else GroupStateTimeout.NoTimeout)
    return (
        buckets.groupBy("bucket")
        .applyInPandasWithState(gate, outputStructType=out_schema,
                                stateStructType=state_schema,
                                outputMode="append",
                                timeoutConf=timeout)
    )


def streaming_conversations(stream: DataFrame, key: str = "user_id",
                            ts_col: str = "ts", role_col: str = "role",
                            content_col: str = "content",
                            gap_seconds: int = 1800,
                            eos: str = "<|end|>",
                            state_timeout_ms: int = 0) -> DataFrame:
    """Streaming analog of ``operators.conversation``'s assemble+render:
    accumulate each key's turns in the state store and EMIT a rendered
    conversation row when the gap rule CLOSES it (a later event arrives
    more than ``gap_seconds`` after the last turn) — the session-window
    emit-on-close pattern.

    Semantics vs batch: a closed conversation's ``(conv_seq, n_turns,
    chat_text)`` is byte-identical to the batch
    ``assemble_conversations → render_chat`` output for the same events
    (identity test-proven) as long as disorder stays WITHIN the open
    conversation: turns are buffered as ``(ts_us, role, content)``
    tuples and sorted by ``(ts, arrival order)`` only at emit time, so
    an event that arrives in a later micro-batch with an earlier
    timestamp than already-buffered turns still renders in timestamp
    order. (An event older than an already-CLOSED boundary cannot be
    merged — emit-on-close is eager; route such data through the batch
    rebuild, same contract as ``streaming_scd2_sink``.) The still-open
    tail conversation is not emitted until a later trigger closes it
    (or the key's state times out, which emits nothing — at-most-once
    for abandoned tails; wire ``state_timeout_ms`` to the retention
    SLA).

    State per key: (last_ts, conv_seq, ts_us[], roles[], contents[]) —
    bounded by the open conversation's length, not history. Output: one
    row per CLOSED conversation, append mode.

    STATE-SCHEMA MIGRATION: v2 (round 8) added the ``ts_us`` array
    (sort-at-emit fix); v3 (round 9) prepends an explicit
    ``schema_ver`` field, so any future incompatible resume fails FAST
    at first state read with an actionable restart-with-fresh-
    checkpoint message instead of an opaque unpack error — the
    ``_check_state_version`` contract shared by every stateful
    operator in this module.
    """
    from pyspark.sql.types import ArrayType, StringType

    out_schema = StructType([
        StructField(key, LongType()),
        StructField("conv_seq", LongType()),
        StructField("n_turns", LongType()),
        StructField("chat_text", StringType()),
    ])
    state_schema = StructType([
        StructField("schema_ver", LongType()),
        StructField("last_ts_epoch", LongType()),
        StructField("conv_seq", LongType()),
        StructField("ts_us", ArrayType(LongType())),
        StructField("roles", ArrayType(StringType())),
        StructField("contents", ArrayType(StringType())),
    ])

    def render(ts_us, roles, contents):
        # emit-time ordering: (ts, role, content) — the SAME falls-
        # through key as the batch array_sort struct (micros ts leads;
        # struct comparison then falls through to role, content), so
        # same-microsecond turns order identically in both paths and
        # the byte-identity contract holds without a tiebreak column.
        # The `is not None` legs mirror Spark's ASC nulls-first.
        order = sorted(range(len(ts_us)),
                       key=lambda i: (ts_us[i],
                                      roles[i] is not None,
                                      roles[i] or "",
                                      contents[i] is not None,
                                      contents[i] or ""))
        return "".join(f"<|{roles[i]}|>{contents[i]}{eos}"
                       for i in order)

    state_ver = _STATE_VERSIONS["streaming_conversations"]

    def assemble(key_tuple: Any, pdfs: Iterable[pd.DataFrame],
                 state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            ver, last_ts, seq, ts_us, roles, contents = state.get
            _check_state_version(ver, state_ver, "streaming_conversations")
            ts_us, roles, contents = list(ts_us), list(roles), list(contents)
        else:
            last_ts, seq, ts_us, roles, contents = None, 1, [], [], []
        closed = []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(ts_col, kind="stable")
            ns = pdf[ts_col].astype("int64").to_numpy()
            # gap rule stays second-truncated (batch parity: ts.cast
            # long); buffered order key keeps micros precision
            for nse, role, content in zip(ns, pdf[role_col],
                                          pdf[content_col]):
                e = int(nse) // 1_000_000_000
                if (last_ts is not None and e - last_ts > gap_seconds
                        and roles):
                    closed.append((key_tuple[0], seq, len(roles),
                                   render(ts_us, roles, contents)))
                    seq += 1
                    ts_us, roles, contents = [], [], []
                ts_us.append(int(nse) // 1_000)
                roles.append(str(role))
                contents.append(str(content))
                if last_ts is None or e > last_ts:
                    last_ts = int(e)
        state.update((state_ver,
                      last_ts, seq, ts_us, roles, contents))
        if state_timeout_ms > 0:
            state.setTimeoutDuration(state_timeout_ms)
        if closed:
            yield pd.DataFrame(closed, columns=[key, "conv_seq",
                                                "n_turns", "chat_text"])

    timeout = (GroupStateTimeout.ProcessingTimeTimeout
               if state_timeout_ms > 0 else GroupStateTimeout.NoTimeout)
    return stream.groupBy(key).applyInPandasWithState(
        assemble, out_schema, state_schema, "append", timeout)
