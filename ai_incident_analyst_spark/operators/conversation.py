"""Conversation / SFT data preparation operators.

The reference pipeline stops at flat incident documents; modern
training-data pipelines additionally assemble *multi-turn conversations*
(SFT / chat data) from raw interaction logs and validate their structure
before rendering them into trainable text. This module provides that last
mile as pure DataFrame compositions:

- ``assemble_conversations`` — sessionize an event/message log per user
  (gap rule, same machinery as ``operators/temporal.py:sessionize``) and
  collect each session's turns into an ordered ``array<struct>`` column.
- ``conversation_stats`` / ``validate_conversations`` — structural QA over
  the turns array with JVM higher-order functions (``filter``,
  ``aggregate``, ``zip_with``): role balance, strict user/assistant
  alternation, leading-role and empty-content checks. No Python UDFs.
- ``render_chat`` — flatten validated turns into a single chat-templated
  training string (``<|role|>content`` tag format) with ``F.aggregate``
  string folding — again fully JVM-side.

Scale shape (100 TB): one keyed shuffle (the sessionize window +
``collect_list`` share the same ``user`` partitioning, so Catalyst plans
a single exchange); everything after the collect is a narrow projection
over the turns array. Conversations are bounded by the session gap, so
per-row state is small; there is no driver collect anywhere.

Reference parity: the reference has no conversation operator (its RAG
history is flat JSON, ``src/incident_analyst/history.py``); this family
is part of the beyond-reference training-data surface (brief: multi-turn
SFT assembly alongside dedup/packing/sharding).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def assemble_conversations(df: DataFrame, key: str, ts_col: str,
                           role_col: str, content_col: str,
                           gap_seconds: int = 1800,
                           tiebreak: str | None = None) -> DataFrame:
    """Group a per-event log into conversations: gap-based sessions per
    ``key``, each emitting one row with an ordered ``turns``
    ``array<struct<role,content>>`` plus first/last timestamps.

    Ordering inside ``turns`` is made deterministic by sorting the
    collected structs on ``(ts, tiebreak)`` — ``collect_list`` alone only
    preserves intra-partition order, which is not stable across layouts.
    """
    order = [F.col(ts_col).asc()] + (
        [F.col(tiebreak).asc()] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    prev = F.lag(F.col(ts_col).cast("long")).over(w)
    is_new = (prev.isNull()
              | ((F.col(ts_col).cast("long") - prev) > gap_seconds)
              ).cast("long")
    sess = df.withColumn(
        "__conv_seq",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding,
                                         Window.currentRow)))
    # sort key leads each struct so array_sort orders by (ts, tiebreak).
    # Micros precision, NOT ts.cast("long"): the cast truncates to
    # seconds, which would fall back to the tiebreak inside a same-second
    # group while a SQL twin's ORDER BY ts keeps sub-second order — a
    # silent divergence on sub-second event logs. (Gap detection above
    # intentionally stays second-truncated; twins mirror floor(epoch).)
    turn = F.struct(
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("ts"),
        *( [F.col(tiebreak).cast("long").alias("tb")] if tiebreak else [] ),
        F.col(role_col).cast("string").alias("role"),
        F.col(content_col).cast("string").alias("content"),
    )
    out = (
        sess.groupBy(F.col(key).alias(key), F.col("__conv_seq"))
        .agg(F.array_sort(F.collect_list(turn)).alias("__sorted"),
             F.min(ts_col).alias("first_ts"),
             F.max(ts_col).alias("last_ts"),
             F.count(F.lit(1)).alias("n_turns"))
        .withColumn("turns", F.transform(
            "__sorted", lambda t: F.struct(t["role"].alias("role"),
                                           t["content"].alias("content"))))
        .withColumnRenamed("__conv_seq", "conv_seq")
        .drop("__sorted")
    )
    return out


def _role_count(turns: Column, role: str) -> Column:
    return F.size(F.filter(turns, lambda t: t["role"] == F.lit(role)))


def conversation_stats(conv: DataFrame,
                       turns_col: str = "turns") -> DataFrame:
    """Annotate per-conversation structural stats: role counts, total
    content chars, mean turn length — all array expressions, no UDF."""
    t = F.col(turns_col)
    total_chars = F.aggregate(
        t, F.lit(0).cast("long"),
        lambda acc, x: acc + F.length(x["content"]))
    return (conv
            .withColumn("n_user", _role_count(t, "user"))
            .withColumn("n_assistant", _role_count(t, "assistant"))
            .withColumn("total_chars", total_chars)
            .withColumn("avg_turn_chars",
                        F.round(total_chars / F.greatest(F.size(t),
                                                         F.lit(1)), 6)))


def validate_conversations(conv: DataFrame, turns_col: str = "turns",
                           require_leading: str = "user") -> DataFrame:
    """Structural QA flags per conversation:

    - ``starts_ok``   — first turn's role is ``require_leading``;
    - ``alternates``  — no two consecutive turns share a role
      (``zip_with`` of the array against its own tail);
    - ``no_empty``    — every turn has non-blank content;
    - ``valid``       — conjunction of the above.
    """
    t = F.col(turns_col)
    n = F.size(t)
    starts_ok = (n > 0) & (F.element_at(t, 1)["role"]
                           == F.lit(require_leading))
    tail = F.slice(t, 2, F.greatest(n - 1, F.lit(0)))
    head = F.slice(t, 1, F.greatest(n - 1, F.lit(0)))
    pairs_differ = F.zip_with(head, tail,
                              lambda a, b: a["role"] != b["role"])
    alternates = F.coalesce(
        F.forall(pairs_differ, lambda x: x), F.lit(True))
    no_empty = F.forall(t, lambda x: F.length(F.trim(x["content"])) > 0)
    return (conv
            .withColumn("starts_ok", starts_ok)
            .withColumn("alternates", alternates)
            .withColumn("no_empty", no_empty)
            .withColumn("valid", starts_ok & alternates & no_empty))


def render_chat(conv: DataFrame, turns_col: str = "turns",
                out_col: str = "chat_text",
                eos: str = "<|end|>") -> DataFrame:
    """Flatten ``turns`` into one chat-templated training string:
    ``<|role|>content<|end|>`` per turn, concatenated in order — a
    deterministic ``F.aggregate`` string fold (JVM codegen, no UDF)."""
    t = F.col(turns_col)
    rendered = F.aggregate(
        t, F.lit(""),
        lambda acc, x: F.concat(acc, F.lit("<|"), x["role"], F.lit("|>"),
                                x["content"], F.lit(eos)))
    return conv.withColumn(out_col, rendered)
