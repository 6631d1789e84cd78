"""Robust stats: hand-computed winsorize clamps and MAD flags."""

import pytest

from ai_incident_analyst_spark.operators.robust import (
    group_quantiles,
    mad_outliers,
    winsorize,
)

pytestmark = pytest.mark.usefixtures("spark")


def test_group_quantiles_interpolated(spark):
    df = spark.createDataFrame(
        [("a", float(v)) for v in (1, 2, 3, 4)], "g string, v double")
    r = group_quantiles(df, "g", "v", [0.5, 0.25]).first()
    assert r["q_0_5"] == pytest.approx(2.5)    # linear interpolation
    assert r["q_0_25"] == pytest.approx(1.75)


def test_winsorize_clamps_tails_only(spark):
    vals = list(range(1, 11)) + [1000.0]  # one wild outlier
    df = spark.createDataFrame([("a", float(v)) for v in vals],
                               "g string, v double")
    out = {r["v"]: r["v_w"]
           for r in winsorize(df, "g", "v", 0.0, 0.9).collect()}
    # p90 of 11 values (interpolated) = 10 + 0.0*(1000-10) = 10.0
    assert out[1000.0] == pytest.approx(10.0)
    assert out[5.0] == 5.0  # interior untouched


def test_mad_outliers_flags_far_points(spark):
    vals = [10.0] * 5 + [11.0, 9.0, 12.0, 8.0, 100.0]
    df = spark.createDataFrame([("a", v) for v in vals],
                               "g string, v double")
    rows = mad_outliers(df, "g", "v", k=3.0).collect()
    med = rows[0]["group_median"]
    mad = rows[0]["group_mad"]
    assert med == pytest.approx(10.0)
    assert mad == pytest.approx(0.5)  # deviations: 0x5,1,1,2,2,90 -> med 1? no: sorted 0,0,0,0,0,1,1,2,2,90 -> p50 interp 0.5
    flagged = {r["v"] for r in rows if r["is_outlier"]}
    assert 100.0 in flagged
    assert 10.0 not in flagged


def test_mad_zero_mad_degenerate_rule(spark):
    vals = [5.0] * 6 + [5.1]
    df = spark.createDataFrame([("a", v) for v in vals],
                               "g string, v double")
    rows = mad_outliers(df, "g", "v", k=3.0).collect()
    assert rows[0]["group_mad"] == 0.0
    flagged = {r["v"] for r in rows if r["is_outlier"]}
    assert flagged == {5.1}


def test_theil_sen_robust_to_outlier(spark):
    from ai_incident_analyst_spark.operators.robust import theil_sen_slope
    # clean slope 2; one wild outlier point
    pts = [(float(x), 2.0 * x) for x in range(10)] + [(10.0, 500.0)]
    df = spark.createDataFrame([("a", x, y) for x, y in pts],
                               "g string, x double, y double")
    r = theil_sen_slope(df, "g", "x", "y").first()
    assert r["n_points"] == 11
    assert abs(r["slope"] - 2.0) < 0.5  # OLS would blow past 10
