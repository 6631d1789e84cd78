"""Log template mining (operators/templates.py) + event-rate anomaly
flags (operators/temporal.py:anomalous_buckets)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ai_incident_analyst_spark.operators.templates import (
    mask_template,
    mask_template_sql,
    mine_templates,
)
from ai_incident_analyst_spark.operators.temporal import anomalous_buckets


MASK_CASES = [
    # uuid collapses to one placeholder, not fragments
    ("req 550e8400-e29b-41d4-a716-446655440000 failed",
     "req <UUID> failed"),
    ("conn from 10.42.0.17 refused", "conn from <IP> refused"),
    ("ptr 0xDEADbeef freed", "ptr <HEX> freed"),
    ("trace deadbeefdeadbeefdeadbeef done", "trace <HEX> done"),
    ("took 12.5 ms, 300 rows", "took <NUM> ms, <NUM> rows"),
    # short hex-ish token is NOT masked (below 16-char threshold)
    ("code cafe15 ok", "code cafe<NUM> ok"),
    ("", ""),
]


def test_mask_template_golden(spark):
    df = spark.createDataFrame([(s,) for s, _ in MASK_CASES], ["m"])
    got = [r[0] for r in
           df.select(mask_template("m")).collect()]
    assert got == [want for _, want in MASK_CASES]


def test_mask_template_sql_matches_spark(spark):
    """The DuckDB oracle chain replays byte-identically."""
    import duckdb
    con = duckdb.connect()
    for raw, want in MASK_CASES:
        sql_out = con.execute(
            "SELECT " + mask_template_sql("m") + " FROM (SELECT ? AS m)",
            [raw]).fetchone()
        assert sql_out[0] == want, raw


def test_mine_templates_counts_and_example(spark):
    rows = [
        ("svcA", 1, "took 12 ms"),
        ("svcA", 2, "took 999 ms"),
        ("svcA", 2, "oom killed"),
        ("svcB", 3, "took 5 ms"),
    ]
    df = spark.createDataFrame(rows, ["svc", "user_id", "msg"])
    out = {(r["svc"], r["template"]): r for r in
           mine_templates(df, "msg", keys=["svc"]).collect()}
    a = out[("svcA", "took <NUM> ms")]
    assert a["n_events"] == 2 and a["n_users"] == 2
    assert a["example"] == "took 12 ms"          # min(), deterministic
    assert out[("svcB", "took <NUM> ms")]["n_events"] == 1
    assert out[("svcA", "oom killed")]["n_events"] == 1


def _mk_events(spark, counts):
    """counts: list of (hour_offset, n) -> one key, n events in that hour."""
    base = dt.datetime(2024, 1, 1)
    rows = [("k", base + dt.timedelta(hours=h, minutes=i % 60))
            for h, n in counts for i in range(n)]
    return spark.createDataFrame(rows, ["key", "ts"])


def test_anomalous_buckets_flags_spike_only(spark):
    # 30 calm hours at ~10/h, then a 100-event spike
    counts = [(h, 10 + (h % 3)) for h in range(30)] + [(30, 100)]
    out = anomalous_buckets(_mk_events(spark, counts), key="key",
                            ts_col="ts", bucket="hour", trailing=24)
    rows = {r["bucket"].hour + 24 * (r["bucket"].day - 1): r
            for r in out.collect()}
    assert rows[30]["is_anomaly"] is True
    assert all(not rows[h]["is_anomaly"] for h in range(30))
    # trailing baseline is capped at the window size
    assert rows[30]["baseline_n"] == 24


def test_anomalous_buckets_needs_baseline(spark):
    # fewer than min_baseline prior buckets -> never flagged, even a spike
    counts = [(0, 10), (1, 10), (2, 500)]
    out = anomalous_buckets(_mk_events(spark, counts), key="key",
                            trailing=24, min_baseline=8)
    assert all(not r["is_anomaly"] for r in out.collect())


def test_anomalous_buckets_zero_variance(spark):
    # identical history: variance 0 -> any strict increase with z>0 flags
    # only when dev^2 > 0, i.e. cnt > mean; equal count must NOT flag
    counts = [(h, 7) for h in range(10)] + [(10, 7), (11, 8)]
    out = anomalous_buckets(_mk_events(spark, counts), key="key",
                            trailing=24, min_baseline=8)
    by_h = {r["bucket"].hour: r["is_anomaly"] for r in out.collect()}
    assert by_h[10] is False
    assert by_h[11] is True
