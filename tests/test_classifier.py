"""Logistic-regression trainer: numpy parity, learning sanity, scoring."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from ai_incident_analyst_spark.operators.classifier import (
    doc_quality_features,
    lr_score,
    lr_train,
)

pytestmark = pytest.mark.usefixtures("spark")


def _numpy_gd(x, y, iters, lr=1.0):
    w = np.zeros(x.shape[1])
    for _ in range(iters):
        z = x @ w
        err = 1.0 / (1.0 + np.exp(-z)) - y
        w = w - lr * (x.T @ err) / len(y)
    return w


def _frame(spark, x, y):
    rows = [tuple(float(v) for v in xi) + (float(yi),)
            for xi, yi in zip(x, y)]
    cols = [f"x{i}" for i in range(x.shape[1])]
    return spark.createDataFrame(
        rows, ", ".join(f"{c} double" for c in cols) + ", y double"), cols


def test_lr_train_numpy_parity(spark):
    rng = np.random.default_rng(17)
    x = np.hstack([np.ones((200, 1)), rng.normal(size=(200, 3))])
    true_w = np.array([0.3, 2.0, -1.5, 0.5])
    y = (1 / (1 + np.exp(-(x @ true_w))) > 0.5).astype(float)
    df, cols = _frame(spark, x, y)
    got = lr_train(df, cols, "y", iterations=4, lr=1.0)
    want = _numpy_gd(x, y, iters=4)
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_lr_train_learns_separable_signal(spark):
    rng = np.random.default_rng(5)
    x1 = rng.normal(size=400)
    y = (x1 > 0).astype(float)
    x = np.hstack([np.ones((400, 1)), x1[:, None]])
    df, cols = _frame(spark, x, y)
    w = lr_train(df, cols, "y", iterations=20, lr=2.0)
    assert w[1] > 1.0  # positive slope on the separating feature
    scored = lr_score(df, cols, w)
    got = scored.withColumn(
        "hit", ((F.col("score") > 0.5).cast("double") == F.col("y"))
        .cast("double")).agg(F.avg("hit")).first()[0]
    assert got > 0.95


def test_lr_train_deterministic_across_partitionings(spark):
    rng = np.random.default_rng(9)
    x = np.hstack([np.ones((150, 1)), rng.normal(size=(150, 2))])
    y = rng.integers(0, 2, 150).astype(float)
    df, cols = _frame(spark, x, y)
    a = lr_train(df.repartition(1), cols, "y", iterations=3)
    b = lr_train(df.repartition(11), cols, "y", iterations=3)
    np.testing.assert_allclose(a, b, rtol=1e-9)


def test_lr_score_validates_lengths(spark):
    df = spark.createDataFrame([(1.0, 0.0)], "x0 double, y double")
    with pytest.raises(ValueError):
        lr_score(df, ["x0"], [1.0, 2.0])


def test_lr_train_complete_case_on_dirty_rows(spark):
    """NULL/NaN feature or label rows are dropped before n is counted
    (ADVICE r4): before the fix sum() skipped them while n included
    them, biasing the mean gradient (or NaN-poisoning the weights)."""
    rng = np.random.default_rng(29)
    x = np.hstack([np.ones((100, 1)), rng.normal(size=(100, 2))])
    y = (rng.random(100) > 0.5).astype(float)
    df, cols = _frame(spark, x, y)
    dirty = df.unionByName(spark.createDataFrame(
        [(None, 1.0, 2.0, 1.0), (1.0, float("nan"), 0.5, 0.0),
         (1.0, 0.2, 0.3, None)],
        "x0 double, x1 double, x2 double, y double"))
    got = lr_train(dirty, cols, "y", iterations=3)
    want = lr_train(df, cols, "y", iterations=3)
    np.testing.assert_allclose(got, want, rtol=1e-12)
    assert not any(np.isnan(got))


def test_lr_train_rejects_empty(spark):
    df = spark.createDataFrame([], "x0 double, y double")
    with pytest.raises(ValueError):
        lr_train(df, ["x0"], "y")


def test_doc_quality_features_bounded(spark):
    df = spark.createDataFrame(
        [(1, "the cat sat on the mat 123"), (2, ""), (3, "xyz")],
        "doc_id long, text string")
    feats = doc_quality_features("text")
    out = df.select(*[v.alias(k) for k, v in feats.items()]).collect()
    for r in out:
        for k in ("x_len", "x_digit"):
            assert 0.0 <= r[k] <= 1.0
        assert r["x_the"] >= 0.0 and r["x_toklen"] >= 0.0


def test_calibration_report_hand_computed(spark):
    from ai_incident_analyst_spark.operators.classifier import (
        calibration_report,
    )

    # bin 0: scores .02/.04, labels 0,0 -> mean .03, rate 0
    # bin 9: scores .92/.98, labels 1,0 -> mean .95, rate .5
    # score 1.0 clamps into bin 9 (least(floor(10), 9))
    rows = [(0.02, 0), (0.04, 0), (0.92, 1), (0.98, 0), (1.0, 1)]
    df = spark.createDataFrame(rows, "score double, y int")
    got = {r["bin"]: r for r in
           calibration_report(df, "score", "y").collect()}
    assert set(got) == {0, 9}
    assert got[0]["n"] == 2 and got[0]["mean_score"] == 0.03
    assert got[0]["pos_rate"] == 0.0
    assert got[9]["n"] == 3
    assert got[9]["mean_score"] == round((0.92 + 0.98 + 1.0) / 3, 6)
    assert got[9]["pos_rate"] == round(2 / 3, 6)
    # ece = (2*|.03-0| + 3*|mean9-rate9|)/5, identical on every row
    m9, r9 = got[9]["mean_score"], got[9]["pos_rate"]
    want_ece = round((2 * 0.03 + 3 * abs(m9 - r9)) / 5, 6)
    assert {r["ece"] for r in got.values()} == {want_ece}


def test_calibration_perfectly_calibrated_degenerate(spark):
    from ai_incident_analyst_spark.operators.classifier import (
        calibration_report,
    )

    # constant score .5, half positive -> single bin, ece = 0
    rows = [(0.5, i % 2) for i in range(10)]
    df = spark.createDataFrame(rows, "score double, y int")
    r = calibration_report(df, "score", "y").collect()
    assert len(r) == 1
    assert r[0]["bin"] == 5 and r[0]["ece"] == 0.0
