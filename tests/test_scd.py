"""SCD2 assembly + point-in-time lookup: hand-computed version chains."""

from datetime import datetime

import pytest

from ai_incident_analyst_spark.operators.scd import asof_lookup, scd2_apply

pytestmark = pytest.mark.usefixtures("spark")


def _ts(s):
    return datetime.fromisoformat(s)


def _chain(spark, rows):
    df = spark.createDataFrame(
        rows, "k long, ts timestamp, v string, ord long")
    out = scd2_apply(df, "k", "ts", ["v"], order_col="ord")
    return sorted((r["k"], r["v"], r["valid_from"], r["valid_to"],
                   r["is_current"]) for r in out.collect())


def test_versions_and_intervals(spark):
    rows = [(1, _ts("2024-01-01"), "a", 1),
            (1, _ts("2024-02-01"), "b", 2),
            (1, _ts("2024-03-01"), "c", 3)]
    got = _chain(spark, rows)
    assert got == [
        (1, "a", _ts("2024-01-01"), _ts("2024-02-01"), False),
        (1, "b", _ts("2024-02-01"), _ts("2024-03-01"), False),
        (1, "c", _ts("2024-03-01"), None, True),
    ]


def test_noop_changes_collapse(spark):
    rows = [(1, _ts("2024-01-01"), "a", 1),
            (1, _ts("2024-02-01"), "a", 2),   # no-op
            (1, _ts("2024-03-01"), "b", 3)]
    got = _chain(spark, rows)
    assert got == [
        (1, "a", _ts("2024-01-01"), _ts("2024-03-01"), False),
        (1, "b", _ts("2024-03-01"), None, True),
    ]


def test_same_instant_last_arrival_wins(spark):
    rows = [(1, _ts("2024-01-01"), "a", 1),
            (1, _ts("2024-01-01"), "b", 2)]   # same ts, later ordinal
    got = _chain(spark, rows)
    assert got == [(1, "b", _ts("2024-01-01"), None, True)]


def test_same_instant_noop_echo_collapses(spark):
    # the instant-winner equals the prior state -> fully collapsed
    rows = [(1, _ts("2024-01-01"), "a", 1),
            (1, _ts("2024-02-01"), "b", 2),
            (1, _ts("2024-02-01"), "a", 1)]   # loser at the instant
    got = _chain(spark, rows)
    assert got == [
        (1, "a", _ts("2024-01-01"), _ts("2024-02-01"), False),
        (1, "b", _ts("2024-02-01"), None, True),
    ]


def test_asof_lookup_picks_valid_version(spark):
    dim_src = spark.createDataFrame(
        [(1, _ts("2024-01-01"), "a", 1), (1, _ts("2024-03-01"), "b", 2)],
        "k long, ts timestamp, v string, ord long")
    dim = scd2_apply(dim_src, "k", "ts", ["v"], order_col="ord")
    facts = spark.createDataFrame(
        [(10, 1, _ts("2024-02-15")),   # inside version a
         (11, 1, _ts("2024-03-01")),   # boundary -> new version b
         (12, 1, _ts("2023-12-01")),   # before first version
         (13, 2, _ts("2024-06-01"))],  # unknown key
        "fact_id long, k long, ts timestamp")
    got = {r["fact_id"]: r["v"]
           for r in asof_lookup(facts, dim, "k", "ts").collect()}
    assert got == {10: "a", 11: "b", 12: None, 13: None}
