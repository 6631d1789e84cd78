"""Rollup/continuous-aggregate algebra: incremental merge equivalence and
coarsening correctness (the DuckDB twins prove raw-table equality)."""

import datetime as dt

from pyspark.sql import functions as F

from ai_incident_analyst_spark.operators.rollup import (
    build_rollup,
    merge_rollups,
    query_rollup,
)


def _events(spark, seed, n=300):
    rows = [(dt.datetime(2024, 1 + (i * seed) % 2, 1 + (i * 7) % 27,
                         i % 24), f"t{i % 3}",
             float((i * 31 + seed) % 100) if i % 11 else None)
            for i in range(n)]
    return spark.createDataFrame(rows, "ts timestamp, event_type string, value double")


def _canon(df):
    return sorted(tuple(str(x) for x in r) for r in df.collect())


def test_incremental_merge_equals_full_rebuild(spark):
    """rollup(A) ⊕ rollup(B) == rollup(A ∪ B) — the invariant that lets a
    stored rollup absorb a late batch without re-reading raw history."""
    a, b = _events(spark, 1), _events(spark, 5)
    merged = merge_rollups(build_rollup(a, "ts", ["event_type"], "value"),
                           build_rollup(b, "ts", ["event_type"], "value"),
                           "value")
    full = build_rollup(a.unionByName(b), "ts", ["event_type"], "value")
    assert _canon(merged) == _canon(full)


def test_query_rollup_matches_raw(spark):
    ev = _events(spark, 3)
    roll = build_rollup(ev, "ts", ["event_type"], "value")
    got = _canon(query_rollup(roll, ["event_type"], "value"))
    raw = _canon(
        ev.groupBy("event_type").agg(
            F.count("*").alias("n_rows"),
            F.count("value").alias("n_values"),
            F.sum(F.col("value").cast("decimal(27,4)")).cast("double")
             .alias("total"),
            F.min("value").alias("vmin"), F.max("value").alias("vmax"))
        .withColumn("vavg", F.col("total") / F.col("n_values")))
    assert got == raw


def test_null_values_counted_in_rows_not_values(spark):
    ev = _events(spark, 2)
    r = query_rollup(build_rollup(ev, "ts", [], "value"), [], "value").first()
    assert r.n_rows == 300
    # n_values excludes nulls
    assert r.n_values == 300 - ev.filter(F.col("value").isNull()).count()
