"""As-of join + sessionization tests with hand-computed expectations."""

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from ai_incident_analyst_spark.operators.temporal import asof_join, range_join, sessionize


def _ts_df(spark, rows, cols):
    return spark.createDataFrame([Row(**r) for r in rows]) \
        .select(*[F.to_timestamp(c).alias(c) if c == "ts" else F.col(c)
                  for c in cols])


def test_asof_join_backward_inclusive(spark):
    left = _ts_df(spark, [
        dict(id=1, k="a", ts="2024-01-01 10:00:00"),
        dict(id=2, k="a", ts="2024-01-01 12:00:00"),
        dict(id=3, k="b", ts="2024-01-01 09:00:00"),  # before any right
        dict(id=4, k="a", ts="2024-01-01 11:00:00"),  # exact tie with right
    ], ["id", "k", "ts"])
    right = _ts_df(spark, [
        dict(rid=10, k="a", ts="2024-01-01 09:30:00", v=1.0),
        dict(rid=11, k="a", ts="2024-01-01 11:00:00", v=2.0),
        dict(rid=12, k="b", ts="2024-01-01 10:30:00", v=3.0),
    ], ["rid", "k", "ts", "v"])
    out = {r.id: (r.rid_matched, r.v_matched)
           for r in asof_join(left, right, key="k",
                              right_cols=["rid", "v"], tiebreak="rid").collect()}
    assert out[1] == (10, 1.0)     # latest right <= 10:00 is 09:30
    assert out[2] == (11, 2.0)     # 11:00 row carried forward
    assert out[3] == (None, None)  # no right before 09:00 for key b
    assert out[4] == (11, 2.0)     # inclusive: same-timestamp right matches


def test_asof_join_duplicate_ts_tiebreak(spark):
    left = _ts_df(spark, [dict(id=1, k="a", ts="2024-01-01 10:00:00")],
                  ["id", "k", "ts"])
    right = _ts_df(spark, [
        dict(rid=5, k="a", ts="2024-01-01 09:00:00", v=1.0),
        dict(rid=9, k="a", ts="2024-01-01 09:00:00", v=2.0),
    ], ["rid", "k", "ts", "v"])
    out = asof_join(left, right, key="k", right_cols=["rid", "v"],
                    tiebreak="rid").first()
    assert out.rid_matched == 9  # largest tiebreak wins deterministically


def test_sessionize_gap(spark):
    df = _ts_df(spark, [
        dict(u=1, i=1, ts="2024-01-01 10:00:00"),
        dict(u=1, i=2, ts="2024-01-01 10:20:00"),  # same session (20m)
        dict(u=1, i=3, ts="2024-01-01 12:00:00"),  # new session (100m gap)
        dict(u=2, i=4, ts="2024-01-01 10:00:00"),  # separate key
    ], ["u", "i", "ts"])
    out = {r.i: r.session_id
           for r in sessionize(df, "u", "ts", gap_seconds=1800,
                               order_tiebreak="i").collect()}
    assert out == {1: 1, 2: 1, 3: 2, 4: 1}


def test_sessionize_boundary_exact_gap_is_same_session(spark):
    df = _ts_df(spark, [
        dict(u=1, i=1, ts="2024-01-01 10:00:00"),
        dict(u=1, i=2, ts="2024-01-01 10:30:00"),  # exactly gap → same
        dict(u=1, i=3, ts="2024-01-01 11:00:01"),  # gap+1s → new
    ], ["u", "i", "ts"])
    out = {r.i: r.session_id
           for r in sessionize(df, "u", "ts", gap_seconds=1800,
                               order_tiebreak="i").collect()}
    assert out == {1: 1, 2: 1, 3: 2}


def test_range_join_matches_naive_nonequi(spark):
    import random
    rng = random.Random(7)
    left = spark.createDataFrame(
        [(i, rng.randint(1, 5), rng.randint(0, 100_000)) for i in range(300)],
        "lid long, k long, pt long",
    ).select("lid", "k", F.timestamp_seconds("pt").alias("ts"))
    right_raw = [(i, rng.randint(1, 5), rng.randint(0, 100_000),
                  rng.randint(0, 5000)) for i in range(120)]
    right = spark.createDataFrame(
        right_raw, "rid long, k long, s long, dur long",
    ).select("rid", "k", F.timestamp_seconds("s").alias("win_start"),
             F.timestamp_seconds(F.col("s") + F.col("dur")).alias("win_end"))

    got = {(r.lid, r.rid)
           for r in range_join(left, right, "ts", "win_start", "win_end",
                               key="k", bucket_seconds=600).collect()}
    naive = {(r.lid, r.rid)
             for r in left.join(
                 right,
                 (left.k == right.k)
                 & (left.ts >= right.win_start)
                 & (left.ts <= right.win_end)).collect()}
    assert got == naive and len(got) > 0


def test_range_join_no_nested_loop_plan(spark):
    left = spark.range(10).select(
        F.col("id").alias("lid"), (F.col("id") % 3).alias("k"),
        F.timestamp_seconds(F.col("id") * 100).alias("ts"))
    right = spark.range(5).select(
        F.col("id").alias("rid"), (F.col("id") % 3).alias("k"),
        F.timestamp_seconds(F.col("id") * 100).alias("win_start"),
        F.timestamp_seconds(F.col("id") * 100 + 500).alias("win_end"))
    joined = range_join(left, right, "ts", "win_start", "win_end", key="k")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan


# --- exponential-decay recency aggregation ---------------------------------

def test_decayed_agg_hand_computed(spark):
    from datetime import datetime

    from ai_incident_analyst_spark.operators.temporal import decayed_agg

    rows = [(1, datetime(2024, 1, 8), 10.0),   # exactly one half-life back
            (1, datetime(2024, 1, 15), 4.0),   # at the reference: weight 1
            (2, datetime(2024, 1, 1), 8.0)]    # two half-lives back
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double")
    out = {r["k"]: r["decayed_sum"]
           for r in decayed_agg(df, "k", "ts", "v",
                                half_life_seconds=7 * 86400.0,
                                ref_ts=datetime(2024, 1, 15)).collect()}
    assert out[1] == pytest.approx(10.0 * 0.5 + 4.0, rel=1e-12)
    assert out[2] == pytest.approx(8.0 * 0.25, rel=1e-12)


def test_cusum_identity_vs_sequential(spark):
    from datetime import datetime, timedelta

    from ai_incident_analyst_spark.operators.temporal import cusum_drift

    base = datetime(2024, 1, 1)
    vals = [1.0, 2.0, 0.5, 8.0, 9.0, 0.0, 0.2, 7.5, 7.5, 7.5]
    rows = [(1, base + timedelta(minutes=i), float(v), i)
            for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double, o long")
    out = {r["o"]: (r["cusum"], r["drift_alarm"])
           for r in cusum_drift(df, "k", "ts", "v", target=2.0, slack=1.0,
                                threshold=6.0, order_cols=["o"]).collect()}
    # sequential reference recursion
    s, want = 0.0, {}
    for i, v in enumerate(vals):
        s = max(0.0, s + (v - 2.0 - 1.0))
        want[i] = (round(s, 6), s > 6.0)
    assert out == want


def test_ewma_matches_sequential_reference(spark):
    from datetime import datetime, timedelta

    from ai_incident_analyst_spark.operators.temporal import ewma_smooth

    base = datetime(2024, 1, 1)
    vals = [5.0, 7.0, 3.0, 9.0, 9.0, 1.0, 4.0]
    rows = [(1, base + timedelta(hours=i), v, i)
            for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double, o long")
    a, L = 0.3, 4
    got = {r["o"]: r["ewma"]
           for r in ewma_smooth(df, "k", "ts", "v", alpha=a, lookback=L,
                                order_cols=["o"]).collect()}
    for t in range(len(vals)):
        want = sum(a * (1 - a) ** j * vals[t - j]
                   for j in range(min(L, t + 1)))
        assert got[t] == pytest.approx(round(want, 6), abs=2e-6), t


def test_fill_gaps_locf(spark):
    from datetime import datetime

    from ai_incident_analyst_spark.operators.temporal import fill_gaps

    rows = [(1, datetime(2024, 1, 1, 0), 10.0),
            (1, datetime(2024, 1, 1, 3), 30.0),   # 2 missing hours
            (2, datetime(2024, 1, 1, 5), 7.0)]    # singleton key
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double")
    out = {(r["k"], r["ts"].hour): (r["v"], r["is_observed"])
           for r in fill_gaps(df, "k", "ts", "v", 3600).collect()}
    assert out == {
        (1, 0): (10.0, True),
        (1, 1): (10.0, False),
        (1, 2): (10.0, False),
        (1, 3): (30.0, True),
        (2, 5): (7.0, True),
    }


def test_fill_gaps_tick_dedup_latest_wins(spark):
    from datetime import datetime

    from ai_incident_analyst_spark.operators.temporal import fill_gaps

    rows = [(1, datetime(2024, 1, 1, 0, 0), 1.0),
            (1, datetime(2024, 1, 1, 0, 40), 2.0),  # same hour tick
            (1, datetime(2024, 1, 1, 1, 0), 5.0)]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double")
    out = sorted((r["ts"], r["v"]) for r in
                 fill_gaps(df, "k", "ts", "v", 3600).collect())
    assert [v for _, v in out] == [2.0, 5.0]


def test_funnel_steps_chain_semantics(spark):
    from datetime import datetime as DT

    from ai_incident_analyst_spark.operators.temporal import funnel_steps

    def ts(d, h=0):
        return DT(2024, 1, d, h)

    rows = [
        # u1 completes in order
        (1, ts(1), "view"), (1, ts(2), "click"), (1, ts(3), "purchase"),
        # u2: purchase BEFORE click -> chain breaks at purchase
        (2, ts(1), "view"), (2, ts(3), "click"), (2, ts(2), "purchase"),
        # u3: view only
        (3, ts(1), "view"),
        # u4: click with no prior view -> not even step 1
        (4, ts(1), "click"),
        # u5: completes but outside the 7-day window
        (5, ts(1), "view"), (5, ts(2), "click"), (5, ts(20), "purchase"),
        # u6: earliest-chain check — second view is irrelevant; the
        # click between the views still counts (after FIRST view)
        (6, ts(1), "view"), (6, ts(2), "click"), (6, ts(4), "view"),
        (6, ts(5), "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, "
                                     "event_type string")
    out = {r["user_id"]: r for r in
           funnel_steps(df, "user_id", "ts", "event_type",
                        ["view", "click", "purchase"],
                        within="7 DAYS").collect()}
    assert set(out) == {1, 2, 3, 5, 6}
    assert out[1]["t_3"] == ts(3)
    assert out[2]["t_2"] == ts(3) and out[2]["t_3"] is None
    assert out[3]["t_2"] is None and out[3]["t_3"] is None
    assert out[5]["t_3"] is None            # 7-day window missed
    assert out[6]["t_2"] == ts(2) and out[6]["t_3"] == ts(5)


def test_funnel_steps_equal_ts_not_counted(spark):
    from datetime import datetime as DT

    from ai_incident_analyst_spark.operators.temporal import funnel_steps

    # strictly-increasing contract: click at the same instant as the
    # view does not advance the funnel
    rows = [(1, DT(2024, 1, 1), "view"), (1, DT(2024, 1, 1), "click")]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, "
                                     "event_type string")
    out = funnel_steps(df, "user_id", "ts", "event_type",
                       ["view", "click"]).collect()
    assert out[0]["t_2"] is None


def test_funnel_steps_guard(spark):
    import pytest as _pt

    from ai_incident_analyst_spark.operators.temporal import funnel_steps

    df = spark.createDataFrame([(1, None, "view")],
                               "user_id long, ts timestamp, "
                               "event_type string")
    with _pt.raises(ValueError):
        funnel_steps(df, "user_id", "ts", "event_type", ["view"])
