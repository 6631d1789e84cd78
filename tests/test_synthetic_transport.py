"""logapi synthetic_transport (r13): the O(window) load-generator
endpoint behind the streaming incident-loop scale cell. Pure-python —
no Spark session needed."""

from ai_incident_analyst_spark.sources.logapi import (
    graphql_envelope,
    parse_results,
    synthetic_transport,
)

URL = "synth:?period_ms=1000&dup_pct=10"


def _fetch(lo, hi, url=URL, extra=""):
    nrql = f"SELECT `timestamp`, `message` FROM Log{extra} " \
           f"SINCE {lo} UNTIL {hi}"
    return parse_results(synthetic_transport(
        url, "", graphql_envelope("0", nrql)))


def test_window_bounds_and_determinism():
    rows = _fetch(5_000, 10_000)
    assert rows == _fetch(5_000, 10_000)  # pure function of the window
    ts = [r["timestamp"] for r in rows]
    assert min(ts) >= 5_000 and max(ts) < 10_000
    # one row per period_ms (5) + 10% duplicates (every 10th ordinal)
    base = {t for t in ts}
    assert base == {5_000, 6_000, 7_000, 8_000, 9_000}


def test_adjacent_windows_partition_the_stream():
    a = _fetch(0, 5_000)
    b = _fetch(5_000, 10_000)
    whole = _fetch(0, 10_000)
    assert a + b == whole  # no row lost or repeated at the boundary


def test_duplicates_are_exact():
    rows = _fetch(0, 1_000)  # ordinal 0 → dup injected
    assert len(rows) == 2 and rows[0] == rows[1]


def test_count_probe_arithmetic():
    nrql = "SELECT count(*) FROM Log SINCE 0 UNTIL 10000"
    out = parse_results(synthetic_transport(
        URL, "", graphql_envelope("0", nrql)))
    assert out == [{"count": 11}]  # 10 rows + 10% dups


def test_limit_honored():
    rows = _fetch(0, 100_000, extra="")
    assert len(rows) > 50
    nrql = "SELECT `timestamp` FROM Log SINCE 0 UNTIL 100000 LIMIT 7"
    out = parse_results(synthetic_transport(
        URL, "", graphql_envelope("0", nrql)))
    assert len(out) == 7
