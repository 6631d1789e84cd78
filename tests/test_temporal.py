"""As-of join + sessionization tests with hand-computed expectations."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from ai_incident_analyst_spark.operators.temporal import asof_join, sessionize


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
