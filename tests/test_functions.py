"""Golden-pair tests for scalar functions — value-level checks the
reference never had (SURVEY.md §5 'upgrade'). Fixtures verbatim from
reference tests (FIXTURES.md §4; preprocessor.py:46-50)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from ai_incident_analyst_spark.functions.redaction import (
    DEFAULT_PATTERNS,
    LLM_SIDE_PATTERNS,
    redact,
)
from ai_incident_analyst_spark.functions.text import (
    concat_fields,
    day_trunc_str,
    format_log_line,
    normalize_message,
    truncate_display,
)


def _one(spark, col, **rows):
    return spark.createDataFrame([Row(**rows)]).select(col.alias("out")).first().out


def test_redact_email(spark):
    out = _one(spark, redact(F.col("m")), m="User john.doe@email.com logged in")
    assert out == "User [REDACTED_EMAIL] logged in"


def test_redact_card(spark):
    out = _one(spark, redact(F.col("m")), m="Payment with card 4111 1111 1111 1111")
    assert out == "Payment with card [REDACTED_CARD]"


def test_redact_api_key_and_token(spark):
    assert _one(spark, redact(F.col("m"), LLM_SIDE_PATTERNS),
                m="api_key: abc123") == "api_key=[REDACTED]"
    assert _one(spark, redact(F.col("m"), LLM_SIDE_PATTERNS),
                m="token=xyz") == "token=[REDACTED]"
    # (?i) inline flag must work under Java regex
    assert _one(spark, redact(F.col("m"), LLM_SIDE_PATTERNS),
                m="API-KEY = s3cr3t") == "api_key=[REDACTED]"


def test_redact_chain_order(spark):
    out = _one(spark, redact(F.col("m"), DEFAULT_PATTERNS),
               m="a@b.c pays 4111 1111 1111 1111 now")
    assert out == "[REDACTED_EMAIL] pays [REDACTED_CARD] now"


def test_normalize_message_null(spark):
    df = spark.createDataFrame([(None,)], "m string")
    assert df.select(normalize_message(F.col("m")).alias("o")).first().o == ""


def test_concat_null_skip(spark):
    # embedder.py:21 skips None fields: {message:null, event:'b'} -> 'b'
    df = spark.createDataFrame([(None, "b")], "message string, event string")
    out = df.select(concat_fields("message", "event").alias("o")).first().o
    assert out == "b"
    df2 = spark.createDataFrame([Row(message="a", event="b")])
    assert df2.select(concat_fields("message", "event").alias("o")).first().o == "a b"


def test_day_trunc(spark):
    df = spark.createDataFrame([Row(ts="2025-07-25T10:00:00")]) \
        .select(F.to_timestamp("ts").alias("ts"))
    assert df.select(day_trunc_str("ts").alias("d")).first().d == "2025-07-25"


def test_truncate_display(spark):
    long = "x" * 100
    assert _one(spark, truncate_display(F.col("m"), 80), m=long) == "x" * 80 + "..."
    assert _one(spark, truncate_display(F.col("m"), 80), m="short") == "short"


def test_format_log_line(spark):
    df = spark.createDataFrame(
        [Row(ts="2025-07-25T10:00:00Z", svc="svc-db", lvl="error",
             msg="Database connection timeout on service X")])
    out = df.select(format_log_line("ts", "svc", "lvl", "msg").alias("o")).first().o
    assert out == ("- 2025-07-25T10:00:00Z | svc-db | error | "
                   "Database connection timeout on service X")


def test_truncate_renorm_matryoshka(spark):
    from ai_incident_analyst_spark.functions.vectors import truncate_renorm

    import math
    df = spark.createDataFrame([([3.0, 4.0, 100.0, -7.0],)],
                               "v array<double>")
    out = df.select(truncate_renorm("v", 2).alias("t")).collect()[0]["t"]
    assert out == pytest.approx([0.6, 0.8], abs=1e-12)
    assert math.isclose(sum(x * x for x in out), 1.0, abs_tol=1e-12)
