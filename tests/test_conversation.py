"""Conversation/SFT assembly operators (operators/conversation.py):
gap sessionization, turn ordering, structural QA flags, chat-template
rendering — value-checked on hand-built logs with known answers."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from ai_incident_analyst_spark.operators.conversation import (
    assemble_conversations,
    conversation_stats,
    render_chat,
    validate_conversations,
)


def _log(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, "
              "role string, content string")


def _ts(minute, second=0):
    return datetime(2024, 1, 1, 12, minute, second)


@pytest.fixture(scope="module")
def convs(spark):
    rows = [
        # user 1, conv 1: valid user/assistant alternation
        (1, 1, _ts(0), "user", "hi"),
        (1, 2, _ts(1), "assistant", "hello"),
        (1, 3, _ts(2), "user", "thanks"),
        # user 1, conv 2 (gap > 30 min): starts with assistant
        (1, 4, _ts(50), "assistant", "ping"),
        (1, 5, _ts(51), "user", "pong"),
        # user 2, conv 1: two consecutive user turns + empty content
        (2, 6, _ts(0), "user", "a"),
        (2, 7, _ts(1), "user", "   "),
    ]
    return assemble_conversations(_log(spark, rows), "user_id", "ts",
                                  "role", "content",
                                  gap_seconds=1800, tiebreak="event_id")


def test_sessionization_and_order(convs):
    rows = {(r["user_id"], r["conv_seq"]): r
            for r in convs.collect()}
    assert set(rows) == {(1, 1), (1, 2), (2, 1)}
    c11 = rows[(1, 1)]
    assert c11["n_turns"] == 3
    assert [t["content"] for t in c11["turns"]] == ["hi", "hello", "thanks"]
    assert [t["role"] for t in c11["turns"]] == [
        "user", "assistant", "user"]


def test_order_is_ts_then_tiebreak(spark):
    # identical ts: event_id must break the tie deterministically
    rows = [(1, 9, _ts(0), "user", "second"),
            (1, 3, _ts(0), "user", "first")]
    out = assemble_conversations(_log(spark, rows), "user_id", "ts",
                                 "role", "content",
                                 gap_seconds=60, tiebreak="event_id")
    turns = out.collect()[0]["turns"]
    assert [t["content"] for t in turns] == ["first", "second"]


def test_stats(convs):
    got = {(r["user_id"], r["conv_seq"]): r
           for r in conversation_stats(convs).collect()}
    c11 = got[(1, 1)]
    assert (c11["n_user"], c11["n_assistant"]) == (2, 1)
    assert c11["total_chars"] == len("hi") + len("hello") + len("thanks")
    assert c11["avg_turn_chars"] == round(13 / 3, 6)


def test_validate_flags(convs):
    got = {(r["user_id"], r["conv_seq"]): r
           for r in validate_conversations(convs).collect()}
    assert got[(1, 1)]["valid"]
    v12 = got[(1, 2)]
    assert not v12["starts_ok"] and v12["alternates"] and v12["no_empty"]
    v21 = got[(2, 1)]
    assert v21["starts_ok"] and not v21["alternates"] and not v21["no_empty"]
    assert not v12["valid"] and not v21["valid"]


def test_render_chat(convs):
    got = {(r["user_id"], r["conv_seq"]): r["chat_text"]
           for r in render_chat(convs).collect()}
    assert got[(1, 1)] == ("<|user|>hi<|end|><|assistant|>hello<|end|>"
                           "<|user|>thanks<|end|>")


def test_no_python_udf_in_plan(convs):
    # the whole family must stay JVM-side: no BatchEvalPython /
    # ArrowEvalPython stages in any of the derived plans
    for df in (conversation_stats(convs), validate_conversations(convs),
               render_chat(convs)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan


def test_subsecond_order_survives_without_tiebreak(spark):
    # sub-second timestamps inside the same second must order by the
    # micros-precision ts (advice r7: ts.cast("long") truncated to
    # seconds and silently fell back to the tiebreak / struct tail)
    from datetime import datetime

    def us(micro):
        return datetime(2024, 1, 1, 12, 0, 0, micro)

    rows = [(1, 1, us(900_000), "assistant", "third"),
            (1, 2, us(100_000), "user", "first"),
            (1, 3, us(500_000), "assistant", "second")]
    out = assemble_conversations(_log(spark, rows), "user_id", "ts",
                                 "role", "content",
                                 gap_seconds=1800).collect()
    assert len(out) == 1
    assert [t["content"] for t in out[0]["turns"]] == [
        "first", "second", "third"]
