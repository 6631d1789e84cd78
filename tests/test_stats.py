"""ols_by_group / chi_squared: numpy & scipy-free hand truths."""

import numpy as np
import pytest

from ai_incident_analyst_spark.operators.stats import chi_squared, ols_by_group

pytestmark = pytest.mark.usefixtures("spark")


def test_ols_matches_numpy_polyfit(spark):
    rng = np.random.default_rng(7)
    x = rng.uniform(0, 10, 120)
    y = 3.5 * x - 2.0 + rng.normal(0, 0.5, 120)
    df = spark.createDataFrame(
        [("g", float(a), float(b)) for a, b in zip(x, y)],
        "k string, x double, y double")
    r = ols_by_group(df, "k", "x", "y").first()
    slope, intercept = np.polyfit(x, y, 1)
    assert r["slope"] == pytest.approx(slope, rel=1e-6)
    assert r["intercept"] == pytest.approx(intercept, rel=1e-6)
    corr = np.corrcoef(x, y)[0, 1]
    assert r["r2"] == pytest.approx(corr ** 2, rel=1e-6)


def test_ols_zero_variance_is_null(spark):
    df = spark.createDataFrame([("g", 1.0, float(i)) for i in range(5)],
                               "k string, x double, y double")
    r = ols_by_group(df, "k", "x", "y").first()
    assert r["slope"] is None and r["intercept"] is None and r["r2"] is None


def test_chi2_hand_computed_2x2(spark):
    # classic 2x2: O = [[10, 20], [20, 10]]
    rows = ([("a", "x")] * 10 + [("a", "y")] * 20
            + [("b", "x")] * 20 + [("b", "y")] * 10)
    df = spark.createDataFrame(rows, "c1 string, c2 string")
    r = chi_squared(df, "c1", "c2").first()
    # E = 15 everywhere; chi2 = 4 * (5^2/15) = 20/3
    assert r["chi2"] == pytest.approx(20 / 3, abs=1e-6)
    assert r["dof"] == 1
    assert r["n"] == 60


def test_chi2_zero_cells_counted(spark):
    # b never co-occurs with y: the zero cell's expected mass must count
    rows = [("a", "x")] * 5 + [("a", "y")] * 5 + [("b", "x")] * 10
    df = spark.createDataFrame(rows, "c1 string, c2 string")
    r = chi_squared(df, "c1", "c2").first()
    # O: a,x=5 a,y=5 b,x=10 b,y=0; E: a,x=7.5 a,y=2.5 b,x=7.5 b,y=2.5
    want = (5-7.5)**2/7.5 + (5-2.5)**2/2.5 + (10-7.5)**2/7.5 + 2.5
    assert r["chi2"] == pytest.approx(want, abs=1e-6)
    assert r["dof"] == 1


def test_chi2_independent_is_zero(spark):
    rows = [(a, b) for a in ("p", "q") for b in ("x", "y") for _ in range(25)]
    df = spark.createDataFrame(rows, "c1 string, c2 string")
    r = chi_squared(df, "c1", "c2").first()
    assert r["chi2"] == pytest.approx(0.0, abs=1e-9)


def test_chi2_null_categories_dropped_complete_case(spark):
    """Rows with a NULL category must be dropped entirely (ADVICE r4):
    before the fix they inflated n (misattributed to the zero-cell mass)
    while their observed cells vanished at the inner joins."""
    rows = ([("a", "x")] * 10 + [("a", "y")] * 20
            + [("b", "x")] * 20 + [("b", "y")] * 10)
    clean = spark.createDataFrame(rows, "c1 string, c2 string")
    dirty = clean.unionByName(spark.createDataFrame(
        [(None, "x"), (None, "y"), ("a", None), (None, None)],
        "c1 string, c2 string"))
    want = chi_squared(clean, "c1", "c2").first()
    got = chi_squared(dirty, "c1", "c2").first()
    assert got["n"] == want["n"] == 60
    assert got["chi2"] == pytest.approx(want["chi2"], abs=1e-9)
    assert got["dof"] == want["dof"] == 1


def test_ols_null_rows_excluded_entirely(spark):
    rows = [("g", 1.0, 2.0), ("g", 3.0, 4.0), ("g", None, 10.0),
            ("g", 5.0, None)]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    r = ols_by_group(df, "k", "x", "y").first()
    assert r["n"] == 2           # complete cases only
    assert r["slope"] == pytest.approx(1.0)
    assert r["intercept"] == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# Welch t-test / Benford / quantile normalization (round 8)
# ---------------------------------------------------------------------------

def test_welch_t_test_known_answer(spark):
    from ai_incident_analyst_spark.operators.stats import welch_t_test

    a = [2.1, 2.5, 2.3, 2.7, 2.4]
    b = [1.9, 2.0, 2.2, 1.8]
    rows = [("a", v) for v in a] + [("b", v) for v in b] + \
        [("c", 99.0), ("a", None), ("b", float("nan"))]
    df = spark.createDataFrame(rows, "g string, v double")
    out = welch_t_test(df, "g", "v", "a", "b").collect()
    assert len(out) == 1
    r = out[0]
    # closed-form reference (numpy, Bessel-corrected)
    import numpy as np
    xa, xb = np.array(a), np.array(b)
    va, vb = xa.var(ddof=1) / len(a), xb.var(ddof=1) / len(b)
    t_ref = (xa.mean() - xb.mean()) / np.sqrt(va + vb)
    df_ref = (va + vb) ** 2 / (va ** 2 / (len(a) - 1)
                               + vb ** 2 / (len(b) - 1))
    assert r["n_a"] == 5 and r["n_b"] == 4          # null/NaN dropped
    assert r["t"] == pytest.approx(t_ref, abs=1e-6)
    assert r["df"] == pytest.approx(df_ref, abs=1e-6)


def test_welch_t_test_small_group_nulls(spark):
    from ai_incident_analyst_spark.operators.stats import welch_t_test

    df = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("b", 3.0)], "g string, v double")
    r = welch_t_test(df, "g", "v", "a", "b").collect()[0]
    assert r["t"] is None and r["df"] is None       # n_a = 1: undefined


def test_benford_report_mass_and_digits(spark):
    from ai_incident_analyst_spark.operators.stats import benford_report

    vals = [1.0, 12.5, 0.19, 199.0, 2.5, 25.0, 3.14, 9000.0,
            -5.0, 0.0]  # negatives / zeros excluded
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    rows = {r["digit"]: r for r in benford_report(df, "x").collect()}
    # ALWAYS 9 rows: absent digits appear with n_obs = 0 (advice r8 —
    # skipping them understated chi2 exactly when fabrication is worst)
    assert set(rows) == set(range(1, 10))
    assert rows[1]["n_obs"] == 4           # 1.0, 12.5, 0.19, 199.0
    assert rows[2]["n_obs"] == 2
    assert rows[5]["n_obs"] == 0
    assert sum(r["n_obs"] for r in rows.values()) == 8
    assert sum(r["p_obs"] for r in rows.values()) == pytest.approx(1.0, abs=1e-5)
    import math
    assert rows[1]["p_benford"] == pytest.approx(math.log10(2), abs=1e-6)
    # zero-observation digit still contributes its full n*p chi2 mass
    assert rows[5]["chi2_term"] == pytest.approx(
        8 * math.log10(1.2), abs=1e-5)


def test_quantile_normalize_matches_numpy(spark):
    from ai_incident_analyst_spark.operators.stats import quantile_normalize

    import numpy as np
    rng = [("g1", i, float(v)) for i, v in enumerate([3, 1, 4, 1, 5, 9, 2, 6])]
    rng += [("g2", 100 + i, float(v)) for i, v in
            enumerate([100, 50, 75, 25])]
    rng += [("g3", 200, 7.0)]   # singleton group -> pr = 0.5
    df = spark.createDataFrame(rng, "g string, id long, v double")
    out = {r["id"]: r["normalized"]
           for r in quantile_normalize(df, "g", "v", "id").collect()}

    allv = sorted((v, i) for g, i, v in rng)
    gvals = np.array([v for v, _ in allv])
    n = len(gvals)

    def ref(group):
        items = sorted((v, i) for g, i, v in rng if g == group)
        ng = len(items)
        res = {}
        for rk, (v, i) in enumerate(items, start=1):
            pr = (rk - 1) / (ng - 1) if ng > 1 else 0.5
            p = pr * (n - 1)  # 0-based fractional position
            lo, hi = int(np.floor(p)), int(np.ceil(p))
            frac = p - lo
            res[i] = gvals[lo] + frac * (gvals[hi] - gvals[lo])
        return res

    want = {}
    for g in ("g1", "g2", "g3"):
        want.update(ref(g))
    assert set(out) == set(want)
    for i in want:
        assert out[i] == pytest.approx(want[i], abs=1e-6), i
    # extremes of each multi-row group hit the global min/max
    assert out[103] == pytest.approx(gvals[0], abs=1e-9)    # g2 min (25)
    assert out[5] == pytest.approx(gvals[-1], abs=1e-9)     # g1 max value 9


def test_cuped_adjust_matches_numpy_and_reduces_variance(spark):
    from ai_incident_analyst_spark.operators.stats import cuped_adjust

    rng = np.random.default_rng(3)
    x = rng.normal(10, 2, 200)
    y = 0.8 * x + rng.normal(0, 1, 200)
    rows = [(i, float(y[i]), float(x[i])) for i in range(200)]
    rows += [(900, None, 1.0), (901, 2.0, float("nan"))]  # dropped
    df = spark.createDataFrame(rows, "unit long, y double, x double")
    out = cuped_adjust(df, "unit", "y", "x")
    got = {r["unit"]: r for r in out.collect()}
    assert set(got) == set(range(200))
    theta_ref = np.cov(x, y, ddof=1)[0, 1] / np.var(x, ddof=1)
    assert got[0]["theta"] == pytest.approx(theta_ref, abs=1e-5)
    adj = np.array([got[i]["metric_adj"] for i in range(200)])
    ref = y - theta_ref * (x - x.mean())
    assert np.allclose(adj, ref, atol=1e-4)
    # the point of CUPED: adjusted variance drops by ~R^2
    assert adj.var() < 0.5 * y.var()
    # mean is preserved (unbiasedness of the centered adjustment)
    assert adj.mean() == pytest.approx(y.mean(), abs=1e-6)


def test_ratio_metric_ci_matches_numpy_delta(spark):
    from ai_incident_analyst_spark.operators.stats import ratio_metric_ci

    rng = np.random.default_rng(5)
    rows = []
    per_y, per_d = [], []
    for u in range(80):
        k = int(rng.integers(1, 6))
        ys = rng.uniform(0, 10, k)
        rows += [(u, float(v), 1.0) for v in ys]
        per_y.append(ys.sum())
        per_d.append(float(k))
    df = spark.createDataFrame(rows, "unit long, num double, den double")
    r = ratio_metric_ci(df, "unit", "num", "den").collect()[0]
    yv, dv = np.array(per_y), np.array(per_d)
    n = len(yv)
    ratio = yv.mean() / dv.mean()
    var = (np.var(yv, ddof=1) - 2 * ratio * np.cov(yv, dv, ddof=1)[0, 1]
           + ratio ** 2 * np.var(dv, ddof=1)) / (n * dv.mean() ** 2)
    assert r["n_units"] == n
    assert r["ratio"] == pytest.approx(ratio, abs=1e-6)
    assert r["se"] == pytest.approx(np.sqrt(var), abs=1e-6)
    assert r["ci_lo"] == pytest.approx(ratio - 1.96 * np.sqrt(var), abs=1e-5)
    assert r["ci_hi"] == pytest.approx(ratio + 1.96 * np.sqrt(var), abs=1e-5)


def test_srm_check_hand_truth_and_guards(spark):
    from ai_incident_analyst_spark.operators.stats import srm_check

    rows = [("a",)] * 60 + [("b",)] * 40
    df = spark.createDataFrame(rows, "g string")
    out = {r["grp"]: r for r in srm_check(
        df, "g", {"a": 0.5, "b": 0.4, "c": 0.1}).collect()}
    assert set(out) == {"a", "b", "c"}
    assert out["a"]["n_obs"] == 60 and out["a"]["n_expected"] == 50.0
    assert out["a"]["chi2_term"] == pytest.approx(100 / 50, abs=1e-9)
    assert out["c"]["n_obs"] == 0            # designed arm, zero traffic
    assert out["c"]["chi2_term"] == pytest.approx(10.0, abs=1e-9)
    # ratios normalize: {1, 1} == {0.5, 0.5}
    out2 = {r["grp"]: r["n_expected"] for r in srm_check(
        df, "g", {"a": 1.0, "b": 1.0}).collect()}
    assert out2 == {"a": 50.0, "b": 50.0}
    with pytest.raises(ValueError, match="not in the design"):
        srm_check(df, "g", {"a": 1.0}).collect()


def test_did_estimate_matches_numpy(spark):
    from ai_incident_analyst_spark.operators.stats import did_estimate

    rng = np.random.default_rng(9)
    cells = {("t", "pre"): rng.normal(10, 2, 50),
             ("t", "post"): rng.normal(13, 2, 60),   # +3 effect
             ("c", "pre"): rng.normal(8, 2, 55),
             ("c", "post"): rng.normal(9, 2, 45)}    # +1 shared trend
    rows = [(g, p, float(v)) for (g, p), xs in cells.items() for v in xs]
    rows += [("x", "pre", 99.0), ("t", "mid", 5.0),
             ("t", "pre", None)]   # out-of-design / null rows dropped
    df = spark.createDataFrame(rows, "g string, p string, v double")
    r = did_estimate(df, "g", "p", "v", treat="t", control="c",
                     pre="pre", post="post").collect()[0]

    def mv(k):
        x = cells[k]
        return x.mean(), x.var(ddof=1) / len(x)

    mt0, vt0 = mv(("t", "pre"))
    mt1, vt1 = mv(("t", "post"))
    mc0, vc0 = mv(("c", "pre"))
    mc1, vc1 = mv(("c", "post"))
    did = (mt1 - mt0) - (mc1 - mc0)
    se = np.sqrt(vt1 + vt0 + vc1 + vc0)
    assert (r["n_tpre"], r["n_tpost"], r["n_cpre"], r["n_cpost"]) \
        == (50, 60, 55, 45)
    assert r["did"] == pytest.approx(did, abs=1e-6)
    assert r["se"] == pytest.approx(se, abs=1e-6)
    assert r["ci_lo"] == pytest.approx(did - 1.96 * se, abs=1e-5)
    # the design recovered ~+2 (3 effect minus 1 shared trend)
    assert 1.0 < r["did"] < 3.0


def test_km_survival_matches_hand_computation(spark):
    from ai_incident_analyst_spark.operators.stats import km_survival

    import math
    # classic toy: durations (event=1 observed, 0 censored)
    rows = [(2, 1), (3, 1), (3, 0), (5, 1), (5, 1), (7, 0), (8, 1)]
    df = spark.createDataFrame(rows, "dur int, evt int")
    out = {r["t"]: r for r in km_survival(df, "dur", "evt").collect()}
    # event times: 2 (n=7,d=1), 3 (n=6,d=1,c=1), 5 (n=4,d=2), 8 (n=1,d=1)
    assert set(out) == {2, 3, 5, 8}
    assert (out[2]["n_risk"], out[2]["n_events"]) == (7, 1)
    assert (out[3]["n_risk"], out[3]["n_censored"]) == (6, 1)
    assert (out[5]["n_risk"], out[5]["n_events"]) == (4, 2)

    def q(x):
        return round(math.log(x) * 1e6)

    assert out[2]["log_surv_micronats"] == q(6 / 7)
    assert out[3]["log_surv_micronats"] == q(6 / 7) + q(5 / 6)
    assert out[5]["log_surv_micronats"] == q(6 / 7) + q(5 / 6) + q(2 / 4)
    # t=8: d == n_risk -> S hits 0, log undefined -> NULL
    assert out[8]["log_surv_micronats"] is None
    # survival values themselves: S(5) = 6/7 * 5/6 * 1/2 = 5/14
    s5 = math.exp(out[5]["log_surv_micronats"] / 1e6)
    assert s5 == pytest.approx(5 / 14, rel=1e-4)


def test_two_proportion_test_known_answer(spark):
    from ai_incident_analyst_spark.operators.stats import (
        two_proportion_test,
    )

    rows = [("a", 1)] * 30 + [("a", 0)] * 70 + \
        [("b", 1)] * 20 + [("b", 0)] * 80 + [("c", 1)] * 5
    df = spark.createDataFrame(rows, "g string, s int")
    r = two_proportion_test(df, "g", "s", "a", "b").collect()[0]
    pa, pb, pp = 0.3, 0.2, 50 / 200
    se_pool = np.sqrt(pp * (1 - pp) * (1 / 100 + 1 / 100))
    se_unpool = np.sqrt(pa * (1 - pa) / 100 + pb * (1 - pb) / 100)
    assert (r["n_a"], r["n_b"]) == (100, 100)
    assert r["p_a"] == 0.3 and r["p_b"] == 0.2
    assert r["z_stat"] == pytest.approx(0.1 / se_pool, abs=1e-6)
    assert r["ci_lo"] == pytest.approx(0.1 - 1.96 * se_unpool, abs=1e-6)
    assert r["ci_hi"] == pytest.approx(0.1 + 1.96 * se_unpool, abs=1e-6)


def test_log_rank_matches_hand_computation(spark):
    from ai_incident_analyst_spark.operators.stats import log_rank_test

    # two tiny arms with a clear difference; one censored row each
    rows = [("a", 1, 1), ("a", 2, 1), ("a", 4, 0),
            ("b", 3, 1), ("b", 5, 1), ("b", 6, 0)]
    df = spark.createDataFrame(rows, "g string, dur int, evt int")
    r = log_rank_test(df, "dur", "evt", "g", "a", "b").collect()[0]

    # hand replay
    subj = [(d, e, g == "a") for g, d, e in rows]
    times = sorted({d for d, e, _ in subj if e == 1})
    ome = vs = 0.0
    for t in times:
        n = sum(1 for d, _, _ in subj if d >= t)
        n1 = sum(1 for d, _, a in subj if d >= t and a)
        dt = sum(1 for d, e, _ in subj if d == t and e == 1)
        da = sum(1 for d, e, a in subj if d == t and e == 1 and a)
        ome += da - dt * n1 / n
        if n > 1:
            vs += dt * (n1 / n) * (1 - n1 / n) * (n - dt) / (n - 1)
    assert (r["n_a"], r["n_b"]) == (3, 3)
    assert (r["events_a"], r["events_b"]) == (2, 2)
    assert r["o_minus_e"] == pytest.approx(ome, abs=1e-6)
    assert r["var_sum"] == pytest.approx(vs, abs=1e-6)
    assert r["chi2"] == pytest.approx(ome * ome / vs, abs=1e-5)


def test_log_rank_identical_groups_near_zero(spark):
    from ai_incident_analyst_spark.operators.stats import log_rank_test

    rows = [(g, d, 1) for g in ("a", "b") for d in (1, 2, 3, 4, 5)]
    df = spark.createDataFrame(rows, "g string, dur int, evt int")
    r = log_rank_test(df, "dur", "evt", "g", "a", "b").collect()[0]
    assert abs(r["o_minus_e"]) < 1e-9
    assert r["chi2"] == pytest.approx(0.0, abs=1e-9)


def test_conformal_intervals_coverage_and_exact_quantile(spark):
    from ai_incident_analyst_spark.operators.stats import (
        conformal_ols_intervals,
    )

    rng = np.random.default_rng(21)
    n = 4000
    x = rng.uniform(0, 10, n)
    y = 2.0 * x + 1.0 + rng.normal(0, 1.0, n)
    df = spark.createDataFrame(
        [(i, float(x[i]), float(y[i])) for i in range(n)],
        "rid long, x double, y double")
    r = conformal_ols_intervals(df, "rid", "x", "y",
                                alpha=0.1).collect()[0]
    # splits partition the input
    assert r["n_train"] + r["n_cal"] + r["n_test"] == n
    # the fit recovered the line
    assert r["slope"] == pytest.approx(2.0, abs=0.1)
    assert r["intercept"] == pytest.approx(1.0, abs=0.3)
    # q_hat for N(0,1) residuals at alpha=.1 is ~1.64; generous band
    assert 1.3 < r["q_hat"] < 2.1
    # the conformal guarantee: coverage >= 1 - alpha (up to sampling
    # noise on ~1000 test rows; 3 sigma below 0.9 is ~0.87)
    assert r["coverage"] >= 0.87
    # degenerate alpha: quantile off the sample end must raise
    import pytest as _pt
    with _pt.raises(ValueError, match="calibration"):
        conformal_ols_intervals(df.limit(20), "rid", "x", "y",
                                alpha=0.001)


def test_quantile_normalize_drops_null_values(spark):
    # NULL/NaN values must not shift ranks (engines disagree on NULL
    # sort position: Spark NULLS FIRST, SQL NULLS LAST)
    from ai_incident_analyst_spark.operators.stats import (
        quantile_normalize,
    )

    clean = [("g1", i, float(v)) for i, v in enumerate([3, 1, 4, 2])]
    df = spark.createDataFrame(
        clean + [("g1", 90, None), ("g1", 91, float("nan"))],
        "g string, id long, v double")
    out = {r["id"]: r["normalized"]
           for r in quantile_normalize(df, "g", "v", "id").collect()}
    want = {r["id"]: r["normalized"]
            for r in quantile_normalize(
                spark.createDataFrame(clean, "g string, id long, v double"),
                "g", "v", "id").collect()}
    assert out == want
    assert 90 not in out and 91 not in out


def test_welch_t_test_absent_group_one_row(spark):
    """An absent group yields n=0 / NULL stats, never an empty frame
    (advice r8: the old groupBy+crossJoin form emitted ZERO rows when a
    side was empty, invisible to one-row-out consumers)."""
    from ai_incident_analyst_spark.operators.stats import welch_t_test

    df = spark.createDataFrame(
        [("b", 2.0), ("b", 3.0), ("b", 4.0)], "g string, v double")
    out = welch_t_test(df, "g", "v", "a", "b").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["group_a"], r["group_b"]) == ("a", "b")
    assert r["n_a"] == 0 and r["n_b"] == 3
    assert r["mean_a"] is None and r["mean_b"] == pytest.approx(3.0)
    assert r["t"] is None and r["df"] is None
    # fully empty input: still one row, all-NULL stats
    r2 = welch_t_test(df.filter("g = 'zzz'"), "g", "v", "a", "b").collect()
    assert len(r2) == 1 and r2[0]["n_a"] == 0 and r2[0]["n_b"] == 0
    with pytest.raises(ValueError):
        welch_t_test(df, "g", "v", "b", "b")


def test_two_proportion_absent_group_one_row(spark):
    from ai_incident_analyst_spark.operators.stats import (
        two_proportion_test,
    )

    df = spark.createDataFrame(
        [("b", 1), ("b", 0), ("b", 1)], "g string, s int")
    out = two_proportion_test(df, "g", "s", "a", "b").collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_a"] == 0 and r["n_b"] == 3
    assert r["p_a"] is None
    assert r["p_b"] == pytest.approx(2.0 / 3.0, abs=1e-6)
    assert r["z_stat"] is None and r["ci_lo"] is None
    with pytest.raises(ValueError):
        two_proportion_test(df, "g", "s", "a", "a")


def test_bootstrap_mean_ci_python_replay_and_invariance(spark):
    """The hash-seeded Poisson bootstrap replays exactly in pure
    Python: identical weights (shared CDF literal ladder), identical
    rounded resample means, identical order-statistic endpoints —
    and the result is partitioning-invariant."""
    import hashlib
    import math

    from ai_incident_analyst_spark.operators.stats import (
        _POIS1_CDF,
        bootstrap_mean_ci,
    )

    import numpy as np
    rng = np.random.default_rng(17)
    vals = np.round(rng.lognormal(0.0, 1.0, 400), 4)   # skewed metric
    rows = [(i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, x double")
    B, alpha = 100, 0.1
    out1 = bootstrap_mean_ci(df, "id", "x", n_resamples=B,
                             alpha=alpha).collect()
    out7 = bootstrap_mean_ci(df.repartition(7), "id", "x",
                             n_resamples=B, alpha=alpha).collect()
    assert len(out1) == 1
    assert out1 == out7                       # layout invariance
    r = out1[0]

    def weight(b, i):
        h = hashlib.md5(f"boot:{b}:{i}".encode()).hexdigest()
        u = (int(h[:13], 16) + 0.5) / float(16 ** 13)
        for k, c in enumerate(_POIS1_CDF):
            if u < c:
                return k
        return 6

    means = []
    for b in range(B):
        ws = np.array([weight(b, i) for i in range(len(vals))],
                      dtype=float)
        if ws.sum() > 0:
            means.append(round(float((ws * vals).sum() / ws.sum()), 6))
    means.sort()
    r_lo = math.ceil(B * alpha / 2)
    r_hi = math.ceil(B * (1 - alpha / 2))
    assert r["ci_lo"] == pytest.approx(means[r_lo - 1], abs=2e-6)
    assert r["ci_hi"] == pytest.approx(means[r_hi - 1], abs=2e-6)
    assert r["n"] == 400 and r["n_resamples"] == B
    assert r["ci_lo"] < r["mean"] < r["ci_hi"]
    # ~90% CI for a lognormal(0,1) mean of n=400 is tight around e^0.5
    assert 1.2 < r["ci_lo"] < r["ci_hi"] < 2.2


def test_bootstrap_mean_ci_guards(spark):
    from ai_incident_analyst_spark.operators.stats import (
        bootstrap_mean_ci,
    )

    df = spark.createDataFrame([(1, 1.0)], "id long, x double")
    with pytest.raises(ValueError):
        bootstrap_mean_ci(df, "id", "x", n_resamples=1)
    with pytest.raises(ValueError):
        bootstrap_mean_ci(df, "id", "x", alpha=0.0)


def test_sprt_bernoulli_python_replay(spark):
    """Exact replay: the LLR is k*c1 + (n-k)*c0 on shared constants, so
    a sequential pure-Python walk must reproduce the decision point
    bit-for-bit; partitioning must not matter."""
    import math

    from ai_incident_analyst_spark.operators.stats import sprt_bernoulli

    import numpy as np
    rng = np.random.default_rng(9)
    xs = (rng.random(2000) < 0.3).astype(int)       # true p = 0.3
    rows = [(i, int(x)) for i, x in enumerate(xs)]
    p0, p1, alpha, beta = 0.2, 0.35, 0.05, 0.2
    df = spark.createDataFrame(rows, "i long, s int")
    out1 = sprt_bernoulli(df, "i", "s", p0, p1, alpha, beta).collect()
    out7 = sprt_bernoulli(df.repartition(7), "i", "s",
                          p0, p1, alpha, beta).collect()
    assert out1 == out7
    r = out1[0]

    c1, c0 = math.log(p1 / p0), math.log((1 - p1) / (1 - p0))
    up, lo = math.log((1 - beta) / alpha), math.log(beta / (1 - alpha))
    k = 0
    hit = None
    for n, x in enumerate(xs, start=1):
        k += x
        llr = k * c1 + (n - k) * c0
        if llr >= up or llr <= lo:
            hit = (n, k, round(llr, 6),
                   "accept_h1" if llr >= up else "accept_h0")
            break
    assert hit is not None
    assert (r["n_decision"], r["k_decision"], r["llr_decision"],
            r["decision"]) == hit
    assert r["n_total"] == 2000 and r["k_total"] == int(xs.sum())


def test_sprt_bernoulli_continue_and_guards(spark):
    from ai_incident_analyst_spark.operators.stats import sprt_bernoulli

    # 3 observations cannot cross Wald boundaries at these settings
    df = spark.createDataFrame([(1, 1), (2, 0), (3, 1)], "i long, s int")
    r = sprt_bernoulli(df, "i", "s", 0.4, 0.6,
                       alpha=0.01, beta=0.01).collect()[0]
    assert r["decision"] == "continue"
    assert r["n_decision"] is None and r["llr_decision"] is None
    assert r["n_total"] == 3 and r["k_total"] == 2
    with pytest.raises(ValueError):
        sprt_bernoulli(df, "i", "s", 0.5, 0.5)
    with pytest.raises(ValueError):
        sprt_bernoulli(df, "i", "s", 0.2, 0.3, alpha=0.0)


def test_loo_group_influence_hand_truth(spark):
    from ai_incident_analyst_spark.operators.stats import (
        loo_group_influence,
    )

    rows = [("a", 10.0), ("a", 20.0), ("b", 1.0), ("b", 2.0), ("b", 3.0),
            ("c", None), ("c", 100.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r["g"]: r for r in
           loo_group_influence(df, "g", "v").collect()}
    # complete-case: N=6, S=136
    assert got["a"]["n"] == 2 and got["a"]["group_mean"] == 15.0
    # without a: (136-30)/4 = 26.5; total mean 136/6
    assert got["a"]["influence"] == pytest.approx(
        round(26.5 - 136 / 6, 6), abs=1e-9)
    # b drags the mean down hard -> strongly positive influence
    assert got["b"]["influence"] > 0
    assert got["c"]["n"] == 1
    # single-group corpus -> NULL influence
    solo = loo_group_influence(
        spark.createDataFrame([("x", 1.0)], "g string, v double"),
        "g", "v").collect()[0]
    assert solo["influence"] is None


def test_msprt_mean_python_replay(spark):
    """Sequential pure-Python replay of the mixture log-LR from the
    same quantized prefix sums; partitioning invariance; a true shift
    rejects, a true null keeps a large always-valid p."""
    import math

    from ai_incident_analyst_spark.operators.stats import msprt_mean

    import numpy as np
    rng = np.random.default_rng(23)
    vals = np.round(rng.normal(105.0, 10.0, 1500), 2)  # true mu=105
    rows = [(i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "i long, x double")
    kw = dict(theta0=100.0, sigma=10.0, tau=5.0, alpha=0.05,
              quantize_scale=100)
    out1 = msprt_mean(df, "i", "x", **kw).collect()
    out7 = msprt_mean(df.repartition(7), "i", "x", **kw).collect()
    assert out1 == out7
    r = out1[0]
    assert r["decision"] == "reject_h0"

    s2, t2, thq = 100.0, 25.0, 100.0 * 100
    s = 0
    llmax, first = -1e18, None
    for n, v in enumerate(vals, start=1):
        s += int(round(float(v) * 100))
        diff = (s - n * thq) / 100.0
        denom = s2 + n * t2
        ll = 0.5 * math.log(s2 / denom) + diff * diff * t2 \
            / (2.0 * s2 * denom)
        llmax = max(llmax, ll)
        if first is None and ll >= math.log(1 / 0.05):
            first = n
    assert r["n_first_reject"] == first
    assert r["log_lambda_max"] == pytest.approx(round(llmax, 6),
                                                abs=1e-9)
    assert r["p_always_valid"] == pytest.approx(
        round(min(1.0, math.exp(-llmax)), 6), abs=1e-9)

    # true null: stays 'continue' with p = 1 whp at this n
    null_vals = np.round(rng.normal(100.0, 10.0, 800), 2)
    dfn = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(null_vals)],
        "i long, x double")
    rn = msprt_mean(dfn, "i", "x", **kw).collect()[0]
    assert rn["decision"] == "continue"
    assert rn["p_always_valid"] > 0.05
    with pytest.raises(ValueError):
        msprt_mean(df, "i", "x", theta0=1.0, sigma=0.0, tau=1.0)


def test_mann_whitney_u_reference(spark):
    """Manual average-rank reference (no scipy in the container):
    U, tie-corrected z, and the one-row/absent-group contracts."""
    import numpy as np

    from ai_incident_analyst_spark.operators.stats import mann_whitney_u

    rng = np.random.default_rng(14)
    a = np.round(rng.normal(5.0, 2.0, 80), 1)    # 1dp -> plenty of ties
    b = np.round(rng.normal(6.0, 2.0, 70), 1)
    rows = [("a", float(x)) for x in a] + [("b", float(x)) for x in b]
    df = spark.createDataFrame(rows, "g string, v double")
    r = mann_whitney_u(df, "g", "v", "a", "b").collect()[0]

    allv = np.concatenate([a, b])
    order = np.sort(np.unique(allv))
    ranks = {}
    start = 1
    for val in order:
        cnt = int((allv == val).sum())
        ranks[float(val)] = start + (cnt - 1) / 2.0
        start += cnt
    ra = sum(ranks[float(x)] for x in a)
    na, nb = len(a), len(b)
    N = na + nb
    u = ra - na * (na + 1) / 2.0
    ties = sum(int((allv == val).sum()) ** 3 - int((allv == val).sum())
               for val in order)
    var = na * nb / 12.0 * ((N + 1) - ties / (N * (N - 1)))
    z = (u - na * nb / 2.0) / var ** 0.5
    assert (r["n_a"], r["n_b"]) == (na, nb)
    assert r["u_a"] == pytest.approx(u, abs=1e-9)
    assert r["z"] == pytest.approx(round(z, 6), abs=1e-6)

    # absent group -> one row, NULL stats; identical values -> NULL z
    empty = mann_whitney_u(df.filter("g = 'a'"), "g", "v",
                           "a", "b").collect()[0]
    assert empty["n_b"] == 0 and empty["z"] is None
    const = spark.createDataFrame(
        [("a", 1.0), ("b", 1.0), ("a", 1.0)], "g string, v double")
    assert mann_whitney_u(const, "g", "v", "a", "b").collect()[0]["z"] \
        is None
    with pytest.raises(ValueError):
        mann_whitney_u(df, "g", "v", "a", "a")


def test_kruskal_wallis_reference(spark):
    """Manual rank reference (no scipy): 3 shifted groups with ties;
    degenerate cases return NULL h."""
    import numpy as np

    from ai_incident_analyst_spark.operators.stats import kruskal_wallis

    rng = np.random.default_rng(31)
    groups = {"a": np.round(rng.normal(5, 2, 50), 1),
              "b": np.round(rng.normal(6, 2, 60), 1),
              "c": np.round(rng.normal(5.5, 2, 40), 1)}
    rows = [(g, float(x)) for g, xs in groups.items() for x in xs]
    df = spark.createDataFrame(rows, "g string, v double")
    r = kruskal_wallis(df, "g", "v").collect()[0]

    allv = np.concatenate(list(groups.values()))
    order = np.sort(np.unique(allv))
    ranks, start = {}, 1
    for val in order:
        cnt = int((allv == val).sum())
        ranks[float(val)] = start + (cnt - 1) / 2.0
        start += cnt
    N = len(allv)
    srr = sum(sum(ranks[float(x)] for x in xs) ** 2 / len(xs)
              for xs in groups.values())
    ties = sum(int((allv == val).sum()) ** 3 - int((allv == val).sum())
               for val in order)
    hh = (12.0 / (N * (N + 1)) * srr - 3 * (N + 1)) \
        / (1 - ties / (N ** 3 - N))
    assert (r["n_groups"], r["n"], r["dof"]) == (3, N, 2)
    assert r["h"] == pytest.approx(round(hh, 6), abs=1e-6)

    one = kruskal_wallis(
        spark.createDataFrame([("a", 1.0), ("a", 2.0)],
                              "g string, v double"), "g", "v").collect()[0]
    assert one["h"] is None and one["dof"] is None
    const = kruskal_wallis(
        spark.createDataFrame([("a", 1.0), ("b", 1.0)],
                              "g string, v double"), "g", "v").collect()[0]
    assert const["h"] is None      # all ties -> correction 0


def test_brown_forsythe_reference(spark):
    """Manual reference with exact lower-median centers; unequal
    spreads -> large F, equal spreads -> modest F; degenerate NULLs."""
    import numpy as np

    from ai_incident_analyst_spark.operators.stats import brown_forsythe

    rng = np.random.default_rng(41)
    a = np.round(rng.normal(0, 1.0, 90), 3)
    b = np.round(rng.normal(0, 4.0, 80), 3)   # 4x the spread
    rows = [("a", float(x)) for x in a] + [("b", float(x)) for x in b]
    df = spark.createDataFrame(rows, "g string, v double")
    r = brown_forsythe(df, "g", "v").collect()[0]

    def lower_median(xs):
        s = np.sort(xs)
        n = len(s)
        # smallest value with 2*rank >= n (unit weights)
        import math
        return float(s[math.ceil(n / 2) - 1])

    zs = {"a": np.abs(a - lower_median(a)),
          "b": np.abs(b - lower_median(b))}
    N = sum(len(x) for x in zs.values())
    k = 2
    zbar = np.concatenate(list(zs.values())).mean()
    ssb = sum(len(x) * (x.mean() - zbar) ** 2 for x in zs.values())
    ssw = sum(((x - x.mean()) ** 2).sum() for x in zs.values())
    f_ref = (ssb / (k - 1)) / (ssw / (N - k))
    assert (r["n_groups"], r["n"], r["dof1"], r["dof2"]) == (2, N, 1,
                                                             N - 2)
    assert r["f"] == pytest.approx(f_ref, rel=1e-6)
    assert r["f"] > 30              # 4x spread is unmissable

    one = brown_forsythe(
        spark.createDataFrame([("a", 1.0), ("a", 5.0)],
                              "g string, v double"), "g", "v").collect()[0]
    assert one["f"] is None
    const = brown_forsythe(
        spark.createDataFrame([("a", 1.0), ("b", 2.0)],
                              "g string, v double"), "g", "v").collect()[0]
    assert const["f"] is None       # zero within-group deviation


def test_spearman_corr_reference(spark):
    """Manual average-rank reference with ties; invariance to monotone
    transforms; degenerate NULLs."""
    import numpy as np

    from ai_incident_analyst_spark.operators.stats import spearman_corr

    rng = np.random.default_rng(51)
    x = np.round(rng.normal(0, 1, 200), 2)
    y = np.round(x ** 3 + rng.normal(0, 0.3, 200), 2)  # monotone-ish
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(x, y)],
        "x double, y double")
    r = spearman_corr(df, "x", "y").collect()[0]

    def avg_ranks(vals):
        order = np.sort(np.unique(vals))
        m, start = {}, 1
        for v in order:
            c = int((vals == v).sum())
            m[float(v)] = start + (c - 1) / 2.0
            start += c
        return np.array([m[float(v)] for v in vals])

    rx, ry = avg_ranks(x), avg_ranks(y)
    rho_ref = np.corrcoef(rx, ry)[0, 1]
    assert r["n"] == 200
    assert r["rho"] == pytest.approx(round(rho_ref, 6), abs=1e-9)
    assert r["rho"] > 0.9

    # monotone transform of x leaves rho unchanged EXACTLY
    df2 = df.selectExpr("exp(x) AS x", "y")
    r2 = spearman_corr(df2, "x", "y").collect()[0]
    assert r2["rho"] == r["rho"]

    const = spark.createDataFrame([(1.0, 2.0), (1.0, 3.0)],
                                  "x double, y double")
    assert spearman_corr(const, "x", "y").collect()[0]["rho"] is None


def test_mantel_haenszel_reference_and_simpson(spark):
    """Hand-computed CMH on two strata, including a designed Simpson
    reversal: the marginal association flips sign while the per-stratum
    (and CMH-pooled) association is consistent."""
    from ai_incident_analyst_spark.operators.stats import (
        mantel_haenszel,
        two_proportion_test,
    )

    # stratum s1: A converts 9/10, B 50/100 -> OR = 9*50/(1*50) = 9
    # stratum s2: A converts 30/100, B 1/10  -> OR = 30*9/(70*1) ~ 3.86
    rows = []
    rows += [("s1", "A", 1)] * 9 + [("s1", "A", 0)] * 1
    rows += [("s1", "B", 1)] * 50 + [("s1", "B", 0)] * 50
    rows += [("s2", "A", 1)] * 30 + [("s2", "A", 0)] * 70
    rows += [("s2", "B", 1)] * 1 + [("s2", "B", 0)] * 9
    df = spark.createDataFrame(rows, "st string, g string, s int")
    r = mantel_haenszel(df, "st", "g", "s", "A", "B").collect()[0]

    tables = [(9, 1, 50, 50), (30, 70, 1, 9)]
    sum_ad = sum(a * d / (a + b + c + d) for a, b, c, d in tables)
    sum_bc = sum(b * c / (a + b + c + d) for a, b, c, d in tables)
    dev = sum(a - (a + b) * (a + c) / (a + b + c + d)
              for a, b, c, d in tables)
    var = sum((a + b) * (c + d) * (a + c) * (b + d)
              / ((a + b + c + d) ** 2 * (a + b + c + d - 1))
              for a, b, c, d in tables)
    assert (r["n_strata"], r["n"], r["dof"]) == (2, 220, 1)
    assert r["or_mh"] == pytest.approx(round(sum_ad / sum_bc, 6),
                                       abs=1e-9)
    assert r["chi2_cmh"] == pytest.approx(round(dev * dev / var, 6),
                                          abs=1e-9)
    # pooled OR favors A strongly...
    assert r["or_mh"] > 3
    # ...while the MARGINAL rates favor B (Simpson's reversal):
    # A: 39/110 ~ 0.355 vs B: 51/110 ~ 0.464
    marg = two_proportion_test(df, "g", "s", "A", "B").collect()[0]
    assert marg["p_a"] < marg["p_b"]

    # zero-margin stratum contributes nothing; single-group -> NULL OR
    solo = mantel_haenszel(
        spark.createDataFrame([("x", "A", 1), ("x", "A", 0)],
                              "st string, g string, s int"),
        "st", "g", "s", "A", "B").collect()[0]
    assert solo["or_mh"] is None


def test_bootstrap_mean_ci_complete_case(spark):
    """NULL/NaN values leave the frame BEFORE the fan-out: the result
    on a dirty frame equals the result on its pre-filtered twin, and
    n/mean describe the clean row set (ADVICE r9: a NULL row must not
    carry Poisson weight into the resample denominators)."""
    from ai_incident_analyst_spark.operators.stats import (
        bootstrap_mean_ci,
    )

    clean = [(i, float(i % 7) + 1.0) for i in range(60)]
    dirty = clean + [(100, None), (101, float("nan")), (102, None)]
    df_c = spark.createDataFrame(clean, "id long, x double")
    df_d = spark.createDataFrame(dirty, "id long, x double")
    out_c = bootstrap_mean_ci(df_c, "id", "x", n_resamples=50).collect()
    out_d = bootstrap_mean_ci(df_d, "id", "x", n_resamples=50).collect()
    assert out_c == out_d
    r = out_d[0]
    assert r["n"] == 60                       # NULL rows not counted
    assert r["mean"] == pytest.approx(
        sum(v for _, v in clean) / 60, abs=1e-6)


def test_sprt_bernoulli_empty_input_one_row(spark):
    """The one-row contract holds on EMPTY input (ADVICE r9): global
    aggs, not orderBy/limit, anchor the output."""
    from ai_incident_analyst_spark.operators.stats import sprt_bernoulli

    df = spark.createDataFrame([], "i long, s int")
    out = sprt_bernoulli(df, "i", "s", 0.2, 0.35).collect()
    assert len(out) == 1
    r = out[0]
    assert r["decision"] == "continue"
    assert r["n_total"] == 0 and r["k_total"] == 0
    assert r["n_decision"] is None and r["llr_decision"] is None
    assert r["llr_final"] is None


def test_msprt_mean_empty_input_one_row(spark):
    from ai_incident_analyst_spark.operators.stats import msprt_mean

    df = spark.createDataFrame([], "i long, x double")
    out = msprt_mean(df, "i", "x", theta0=0.0, sigma=1.0,
                     tau=1.0).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_total"] == 0
    assert r["decision"] == "continue"
    assert r["log_lambda_max"] is None and r["n_first_reject"] is None


def test_spearman_corr_no_int64_overflow_at_2m_rows(spark):
    """Regression (r10 sf1 probe): the doubled-rank sufficient
    statistics are ~4N^3 and blew int64 past ~1.3M rows as a hard ANSI
    ARITHMETIC_OVERFLOW; decimal(38,0) accumulators are exact to
    N ~ 3e12. 2M distinct monotone pairs -> rho exactly 1.0."""
    from ai_incident_analyst_spark.operators.stats import spearman_corr

    df = spark.range(2_000_000).selectExpr(
        "cast(id as double) as x", "cast(id * 2 as double) as y")
    r = spearman_corr(df, "x", "y").collect()[0]
    assert r["n"] == 2_000_000
    assert r["rho"] == 1.0
