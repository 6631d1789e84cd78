"""LogQuery builder + sources tests, including pushdown verification —
the reference ships its filters to the New Relic server (SURVEY.md §4);
our equivalent is filters reaching the parquet scan."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from ai_incident_analyst_spark.plans.logquery import LogQuery
from ai_incident_analyst_spark.sources.tables import load_table, union_tables


def test_logquery_clauses(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = (
        LogQuery(ev)
        .where("event_type", "error")
        .like("props", "%k%")
        .since("2024-01-05 00:00:00")
        .until("2024-01-25 00:00:00")
        .select("event_id", "ts", "event_type")
        .order_by(F.col("event_id").asc())
        .limit(10)
        .df()
    )
    rows = out.collect()
    assert 0 < len(rows) <= 10
    assert all(r.event_type == "error" for r in rows)
    assert [r.event_id for r in rows] == sorted(r.event_id for r in rows)


def test_logquery_relative_since(spark):
    df = spark.createDataFrame(
        [Row(ts="2024-01-01 00:00:00"), Row(ts="2024-01-03 00:00:00")]
    ).select(F.to_timestamp("ts").alias("ts"))
    out = LogQuery(df).since(
        "24 hours ago", now=F.to_timestamp(F.lit("2024-01-03 12:00:00"))).df()
    assert out.count() == 1


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    """P2 predicate must appear as a parquet PushedFilters entry, and the
    projection must prune the read schema (SURVEY.md §4 table)."""
    li = load_table(spark, sf_dir, "lineitem")
    plan = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_quantity")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)]" in plan
    assert "l_extendedprice" not in plan  # column pruning held


def test_union_tables_missing_columns(spark):
    a = spark.createDataFrame([Row(x=1, y="a")])
    b = spark.createDataFrame([Row(x=2)])
    out = union_tables(a, b)
    rows = sorted(out.collect(), key=lambda r: r.x)
    assert rows[1].y is None


def test_events_ts_microsecond_exact(spark, sf_dir):
    """nanos→micros conversion must be integer-exact (regression: double
    division lost precision above 2^53)."""
    ev = load_table(spark, sf_dir, "events")
    import duckdb
    expect = duckdb.sql(
        f"SELECT max(ts) FROM '{sf_dir}/events.parquet'").fetchone()[0]
    got = ev.agg(F.max("ts")).first()[0]
    assert got == expect.replace(tzinfo=None)


def test_tolerant_timestamp_mixed_formats(spark):
    """The reference's own fixture shapes: int epoch seconds
    (test_preprocessing_to_embedding.py) vs ISO strings
    (test_embedding_to_llm.py), plus millis/micros and garbage."""
    from ai_incident_analyst_spark.sources.tables import normalize_log_records

    df = spark.createDataFrame(
        [("1700000000", None),               # epoch seconds as string
         ("1700000000123", "boom"),          # epoch millis
         ("1700000000123456", 17),           # epoch micros; non-str message
         ("2024-01-02 03:04:05", "ok"),      # ISO
         ("not a time", "x")],               # garbage -> null, no error
        "timestamp string, message string")
    out = normalize_log_records(df).collect()
    assert [str(r.timestamp) for r in out] == [
        "2023-11-14 22:13:20",
        "2023-11-14 22:13:20.123000",
        "2023-11-14 22:13:20.123456",
        "2024-01-02 03:04:05",
        "None",
    ]
    # message coercion: None -> "", everything else stringified
    assert [r.message for r in out] == ["", "boom", "17", "ok", "x"]
