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
