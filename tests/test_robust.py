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


# ---------------------------------------------------------------------------
# binary segmentation changepoints (round 9)
# ---------------------------------------------------------------------------

def test_binary_segmentation_recovers_level_shifts(spark):
    """Two clean level shifts: round 1 must find the bigger one, round
    2 the other; gains replay exactly in pure Python (integer
    sufficient statistics)."""
    from ai_incident_analyst_spark.operators.temporal import (
        binary_segmentation,
    )

    # level 10 (idx 1-20), 40 (idx 21-40), 25 (idx 41-60)
    vals = [10] * 20 + [40] * 20 + [25] * 20
    rows = [(i + 1, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "p long, x long")
    out = binary_segmentation(df, "p", "x", n_splits=2,
                              min_seg=3).collect()
    got = [(r["split_round"], r["pos"]) for r in out]
    assert got == [(1, 20), (2, 40)], got

    # python replay of round-1 gain at the chosen split
    import numpy as np
    x = np.array(vals, dtype=np.int64)
    S, N = int(x.sum()), len(x)
    sl, nl = int(x[:20].sum()), 20
    sr, nr = S - sl, N - nl
    g = sl * sl / nl + sr * sr / nr - S * S / N
    assert out[0]["gain"] == pytest.approx(round(g, 6), abs=1e-9)


def test_binary_segmentation_flat_series_and_guards(spark):
    from ai_incident_analyst_spark.operators.temporal import (
        binary_segmentation,
    )

    flat = spark.createDataFrame([(i, 7) for i in range(1, 13)],
                                 "p long, x long")
    assert binary_segmentation(flat, "p", "x", n_splits=2).count() == 0
    short = spark.createDataFrame([(1, 1), (2, 9)], "p long, x long")
    assert binary_segmentation(short, "p", "x", min_seg=3).count() == 0
    with pytest.raises(ValueError):
        binary_segmentation(flat, "p", "x", n_splits=0)


def test_binary_segmentation_partitioning_invariant(spark):
    from ai_incident_analyst_spark.operators.temporal import (
        binary_segmentation,
    )

    import numpy as np
    rng = np.random.default_rng(4)
    vals = np.concatenate([rng.poisson(20, 25), rng.poisson(60, 25)])
    rows = [(i + 1, int(v)) for i, v in enumerate(vals)]
    a = binary_segmentation(
        spark.createDataFrame(rows, "p long, x long"),
        "p", "x", n_splits=2).collect()
    b = binary_segmentation(
        spark.createDataFrame(rows, "p long, x long").repartition(9),
        "p", "x", n_splits=2).collect()
    assert a == b
    assert a and abs(a[0]["pos"] - 25) <= 2   # finds the true shift


def test_segment_trends_consistent_with_changepoints(spark):
    """The piecewise-trend query's segment count must equal
    changepoints+1, and each boundary day must be the last day of its
    segment (the composition contract between the two queries)."""
    from ai_incident_analyst_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.01"
    cps = REGISTRY["changepoints_daily_events"].fn(spark, sf).collect()
    trends = REGISTRY["segment_trends_daily_events"].fn(spark, sf) \
        .collect()
    assert len(trends) == len(cps) + 1
    segs = [r["segment"] for r in trends]
    assert segs == sorted(segs) == list(range(len(trends)))
    # each segment has enough points for a line and a real fit
    assert all(r["n"] >= 3 and r["slope"] is not None for r in trends)


def test_weighted_median_hand_truth(spark):
    from ai_incident_analyst_spark.operators.robust import (
        weighted_median,
    )

    rows = [("a", 1.0, 1), ("a", 2.0, 1), ("a", 100.0, 5),
            ("b", 5.0, 2), ("b", 7.0, 2),
            ("c", 9.0, 3), ("c", 9.0, 1), ("c", 4.0, 1),
            ("d", 1.0, 0), ("d", None, 4), ("d", 8.0, 1)]
    df = spark.createDataFrame(rows, "g string, v double, w long")
    got = {r["g"]: (r["weighted_median"], r["total_weight"])
           for r in weighted_median(df, "g", "v", "w").collect()}
    # a: weights 1,1,5 of 7 -> cum at 100.0 is 7 >= 3.5 first at 100.0?
    #    cum(1.0)=1 (2<7), cum(2.0)=2 (4<7), cum(100.0)=7 (14>=7) -> 100
    assert got["a"] == (100.0, 7)
    # b: even split -> lower median 5.0 (2*2 >= 4)
    assert got["b"] == (5.0, 4)
    # c: value 9.0 pre-aggregated to weight 4; cum(4.0)=1 (2<5),
    #    cum(9.0)=5 (10>=5) -> 9.0
    assert got["c"] == (9.0, 5)
    # d: zero-weight and NULL rows dropped -> only 8.0 remains
    assert got["d"] == (8.0, 1)


def test_weighted_median_equals_plain_median_at_unit_weights(spark):
    import numpy as np

    from ai_incident_analyst_spark.operators.robust import (
        weighted_median,
    )

    rng = np.random.default_rng(6)
    vals = sorted(float(v) for v in rng.normal(0, 1, 101))
    df = spark.createDataFrame([("g", v, 1) for v in vals],
                               "g string, v double, w long")
    r = weighted_median(df, "g", "v", "w").collect()[0]
    assert r["weighted_median"] == vals[50]   # exact middle, n odd


def test_binary_segmentation_engine_rounding_half_away(spark):
    """Gain rounds ENGINE-side (half away from zero, the twin's
    round(g, dp)) — Python round() is banker's and would emit 0.0
    here (ADVICE r9). Series [1,1,0,0,0,0,0,0] with min_seg=4 has
    exactly one candidate split with gain (S_l-S_r)^2/8 = 0.5, which
    is binary-exact: half-away rounds to 1.0, banker's to 0.0."""
    from ai_incident_analyst_spark.operators.temporal import (
        binary_segmentation,
    )

    xs = [1, 1, 0, 0, 0, 0, 0, 0]
    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "p int, x int")
    out = binary_segmentation(df, "p", "x", n_splits=1, min_seg=4,
                              round_dp=0).collect()
    assert len(out) == 1
    assert out[0]["pos"] == 3                 # split AFTER idx 4 -> p=3
    assert out[0]["gain"] == 1.0
