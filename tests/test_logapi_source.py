"""Live log-API connector (Python DSv2): partitioned window reads,
filter pushdown (window consumption + partial NRQL WHERE), fixture
transport, and the incremental streaming reader.

Reference parity: src/ingestion/new_relic_fetcher.py:82-113 (GraphQL
envelope + results extraction), main.py:88-92 (repeated-run polling).
"""

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import _parse_datatype_string

from ai_incident_analyst_spark.sources.logapi import (
    DEFAULT_SCHEMA,
    LogApiDataSource,
    LogApiReader,
    fixture_transport,
    graphql_envelope,
    parse_results,
)

HOUR = 3_600_000
T0 = 1_700_000_000_000  # fixed epoch-ms origin


def _rows(n=24):
    """One log per hour, alternating levels/containers."""
    return [
        {"timestamp": T0 + i * HOUR,
         "level": "ERROR" if i % 3 == 0 else "INFO",
         "container_name": f"conversations-{i % 2}",
         "message": f"error code {i}" if i % 3 == 0 else f"ok {i}",
         "event": "http", "namespace_name": "ns"}
        for i in range(n)
    ]


@pytest.fixture()
def fixture_file(tmp_path):
    p = tmp_path / "logs.json"
    p.write_text(json.dumps(_rows()))
    return str(p)


def _read(spark, fixture_file, **opts):
    spark.dataSource.register(LogApiDataSource)
    r = spark.read.format("logapi") \
        .option("fixture_path", fixture_file) \
        .option("since_ms", T0).option("until_ms", T0 + 24 * HOUR)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_read_all_partitions_union_to_full_set(spark, fixture_file):
    df = _read(spark, fixture_file, num_partitions=5)
    assert df.count() == 24
    assert df.select("timestamp").distinct().count() == 24  # no dup/loss
    assert [f.name for f in df.schema.fields] == [
        "timestamp", "level", "container_name", "message", "event",
        "namespace_name"]


def test_partition_slices_cover_window_disjointly(spark):
    reader = LogApiReader(
        _parse_datatype_string(DEFAULT_SCHEMA),
        {"since_ms": str(T0), "until_ms": str(T0 + 10 * HOUR),
         "num_partitions": "4", "fixture_path": "unused"})
    parts = reader.partitions()
    assert len(parts) == 4
    assert parts[0].start_ms == T0 and parts[-1].end_ms == T0 + 10 * HOUR
    for a, b in zip(parts[:-1], parts[1:]):
        assert a.end_ms == b.start_ms


def test_timestamp_filters_consumed_and_window_tightened(spark):
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThanOrEqual,
        LessThan,
        StringContains,
    )
    reader = LogApiReader(
        _parse_datatype_string(DEFAULT_SCHEMA),
        {"since_ms": str(T0), "until_ms": str(T0 + 24 * HOUR),
         "fixture_path": "unused"})
    filters = [
        GreaterThanOrEqual(("timestamp",), T0 + 6 * HOUR),
        LessThan(("timestamp",), T0 + 12 * HOUR),
        EqualTo(("level",), "ERROR"),
        StringContains(("message",), "error"),
        EqualTo(("message",), "it's unsafe %"),  # quote+wildcard: no push
    ]
    remaining = list(reader.pushFilters(filters))
    # window filters fully consumed; the rest returned for Spark re-check
    assert remaining == filters[2:]
    assert reader.spec.since_ms == T0 + 6 * HOUR
    assert reader.spec.until_ms == T0 + 12 * HOUR
    nrql = reader.spec.nrql(reader.spec.since_ms, reader.spec.until_ms)
    assert "`level` = 'ERROR'" in nrql
    assert "`message` LIKE '%error%'" in nrql
    assert "unsafe" not in nrql  # unsafe literal never compiled
    assert f"SINCE {T0 + 6 * HOUR} UNTIL {T0 + 12 * HOUR}" in nrql


def test_end_to_end_filters_produce_correct_rows(spark, fixture_file):
    df = _read(spark, fixture_file, num_partitions=3)
    got = df.filter((F.col("timestamp") >= T0 + 6 * HOUR)
                    & (F.col("level") == "ERROR")).collect()
    want = [r for r in _rows()
            if r["timestamp"] >= T0 + 6 * HOUR and r["level"] == "ERROR"]
    assert {r["timestamp"] for r in got} == {r["timestamp"] for r in want}


def test_schema_on_read_missing_keys_are_null(spark, tmp_path):
    p = tmp_path / "sparse.json"
    p.write_text(json.dumps(
        [{"timestamp": T0 + 1, "message": "only message"}]))
    df = _read(spark, str(p))
    row = df.first()
    assert row["message"] == "only message"
    assert row["level"] is None and row["event"] is None


def test_base_where_and_limit_compose(spark):
    reader = LogApiReader(
        _parse_datatype_string(DEFAULT_SCHEMA),
        {"since_ms": "0", "until_ms": "10", "limit": "7",
         "where": "`namespace_name` = 'ns'", "fixture_path": "unused"})
    nrql = reader.spec.nrql(0, 10)
    assert nrql.startswith("SELECT `timestamp`, `level`")
    assert "WHERE `namespace_name` = 'ns' SINCE 0 UNTIL 10 LIMIT 7" in nrql


def test_fixture_transport_honors_window_and_count_probe(fixture_file):
    t = fixture_transport(fixture_file)
    env = graphql_envelope("1", f"SELECT `timestamp` FROM Log "
                                f"SINCE {T0} UNTIL {T0 + 2 * HOUR}")
    rows = parse_results(t("u", "k", env))
    assert len(rows) == 2
    probe = parse_results(t("u", "k", graphql_envelope(
        "1", f"SELECT count(*) FROM Log SINCE {T0} UNTIL {T0 + HOUR} "
             f"LIMIT 1")))
    assert probe == [{"count": 1}]


def test_parse_results_malformed_is_empty():
    assert parse_results({"errors": ["boom"]}) == []
    assert parse_results({}) == []
    assert parse_results(
        {"data": {"actor": {"account": {"nrql": {"results": None}}}}}) == []


def test_streaming_reader_drains_window_incrementally(spark, fixture_file):
    spark.dataSource.register(LogApiDataSource)
    import time
    q = (spark.readStream.format("logapi")
         .option("fixture_path", fixture_file)
         .option("since_ms", T0).option("until_ms", T0 + 24 * HOUR)
         .option("batch_ms", 6 * HOUR)
         .load()
         .writeStream.format("memory").queryName("logapi_stream")
         .start())
    try:
        # four 6h micro-batches drain the 24h window; availableNow only
        # covers the first prefetched batch for simple stream readers,
        # so run continuous micro-batches and poll
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.sql(
                    "SELECT count(*) c FROM logapi_stream").first().c >= 24:
                break
            time.sleep(1)
    finally:
        q.stop()
    out = spark.sql("SELECT * FROM logapi_stream")
    assert out.count() == 24
    assert out.select("timestamp").distinct().count() == 24


def test_empty_window_after_pushdown_yields_no_rows(spark, fixture_file):
    df = _read(spark, fixture_file)
    # contradictory range: window collapses; no transport call needed
    assert df.filter((F.col("timestamp") > T0 + 20 * HOUR)
                     & (F.col("timestamp") < T0 + 2 * HOUR)).count() == 0


def test_limit_is_relation_level_single_partition(spark, fixture_file):
    """LIMIT bounds the RELATION, not each slice (code-review r5): a
    limited read collapses to one partition so it can't return up to
    num_partitions*limit rows with order-dependent survivors."""
    df = _read(spark, fixture_file, num_partitions=8, limit=10)
    assert df.count() == 10
    reader = LogApiReader(
        _parse_datatype_string(DEFAULT_SCHEMA),
        {"since_ms": str(T0), "until_ms": str(T0 + 24 * HOUR),
         "num_partitions": "8", "limit": "10", "fixture_path": "unused"})
    assert len(reader.partitions()) == 1


def test_tiny_window_collapses_slices(spark):
    """min_slice_ms floors the slice width: a 400 ms (post-pushdown)
    window must produce ONE fetch slice, not num_partitions near-empty
    POSTs; a wide window still fans out to num_partitions."""
    tiny = LogApiReader(
        _parse_datatype_string(DEFAULT_SCHEMA),
        {"since_ms": "0", "until_ms": "400",
         "num_partitions": "4", "fixture_path": "unused"})
    assert len(tiny.partitions()) == 1
    wide = LogApiReader(
        _parse_datatype_string(DEFAULT_SCHEMA),
        {"since_ms": "0", "until_ms": str(10 * HOUR),
         "num_partitions": "4", "fixture_path": "unused"})
    assert len(wide.partitions()) == 4
    # explicit floor override: 2 slices of >= 200 ms
    half = LogApiReader(
        _parse_datatype_string(DEFAULT_SCHEMA),
        {"since_ms": "0", "until_ms": "400", "min_slice_ms": "200",
         "num_partitions": "4", "fixture_path": "unused"})
    assert len(half.partitions()) == 2


def test_drained_stream_read_returns_iterator(fixture_file):
    """r13 regression: at the until_ms cap read() returns end == start,
    and pyspark's prefetch cache (datasource_internal.add_result_to_cache)
    verifies that case is empty via next() on the result — a bare list
    there crashed every capped stream on the first latestOffset poll
    after drain (TypeError: 'list' object is not an iterator), found by
    the --incident probe at 1M rows."""
    from ai_incident_analyst_spark.sources.logapi import LogApiStreamReader

    reader = LogApiStreamReader(
        _parse_datatype_string(DEFAULT_SCHEMA),
        {"fixture_path": fixture_file, "since_ms": str(T0),
         "until_ms": str(T0 + 2 * HOUR), "batch_ms": str(HOUR)})
    # drain the two windows
    rows1, off1 = reader.read({"ts": T0})
    assert off1 == {"ts": T0 + HOUR} and len(list(rows1)) == 1
    rows2, off2 = reader.read(off1)
    assert off2 == {"ts": T0 + 2 * HOUR} and len(list(rows2)) == 1
    # past the cap: end == start, and the result must satisfy the
    # prefetch cache's next()-based emptiness check
    drained, off3 = reader.read(off2)
    assert off3 == off2
    with pytest.raises(StopIteration):
        next(drained)


def test_capped_stream_survives_polling_past_drain(spark, fixture_file):
    """The integration face of the same regression: a capped stream must
    stay healthy while the engine keeps polling latestOffset after the
    cap is drained (the functional tests used to stop their queries on a
    row-count condition fast enough to mask this)."""
    import time

    spark.dataSource.register(LogApiDataSource)
    q = (spark.readStream.format("logapi")
         .option("fixture_path", fixture_file)
         .option("since_ms", T0).option("until_ms", T0 + 4 * HOUR)
         .option("batch_ms", 2 * HOUR)
         .load()
         .writeStream.format("memory").queryName("logapi_capped")
         .start())
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.sql(
                    "SELECT count(*) c FROM logapi_capped").first().c >= 4:
                break
            time.sleep(0.5)
        # several latestOffset polls past the drained cap
        time.sleep(3)
        assert q.isActive and q.exception() is None
    finally:
        q.stop()
    assert spark.sql("SELECT count(*) c FROM logapi_capped").first().c == 4
