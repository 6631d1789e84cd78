"""PCA: covariance parity vs numpy, eigen/projection invariants."""

import numpy as np
import pytest

from ai_incident_analyst_spark.operators.pca import (
    covariance_stats,
    pca_fit,
    pca_project,
)

pytestmark = pytest.mark.usefixtures("spark")


def _frame(spark, x, parts=4):
    rows = [(i, [float(v) for v in xi]) for i, xi in enumerate(x)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>").repartition(parts)


def test_covariance_numpy_parity(spark):
    rng = np.random.default_rng(3)
    x = rng.normal(size=(120, 6)) @ rng.normal(size=(6, 6))
    n, mean, cov = covariance_stats(_frame(spark, x), "embedding")
    assert n == 120
    np.testing.assert_allclose(mean, x.mean(axis=0), rtol=1e-12)
    np.testing.assert_allclose(cov, np.cov(x.T, bias=True), rtol=1e-10)


def test_covariance_partitioning_invariant(spark):
    rng = np.random.default_rng(8)
    x = rng.normal(size=(90, 5))
    _, m1, c1 = covariance_stats(_frame(spark, x, parts=1), "embedding")
    _, m2, c2 = covariance_stats(_frame(spark, x, parts=9), "embedding")
    np.testing.assert_allclose(m1, m2, rtol=1e-12)
    np.testing.assert_allclose(c1, c2, rtol=1e-10)


def test_pca_recovers_dominant_axis(spark):
    rng = np.random.default_rng(5)
    # variance concentrated on a known direction
    axis = np.array([3.0, 4.0, 0.0, 0.0]) / 5.0
    x = (rng.normal(size=(300, 1)) * 10.0) @ axis[None, :] \
        + rng.normal(size=(300, 4)) * 0.1
    mean, comps, var = pca_fit(_frame(spark, x), "embedding", k=2)
    # first component parallel to the planted axis
    cosine = abs(float(comps[0] @ axis))
    assert cosine > 0.999
    assert var[0] > 50 * var[1]  # explained-variance ordering
    # deterministic sign rule: largest-|coef| coordinate positive
    for c in comps:
        assert c[int(np.argmax(np.abs(c)))] > 0


def test_pca_project_matches_numpy(spark):
    rng = np.random.default_rng(11)
    x = rng.normal(size=(80, 6))
    df = _frame(spark, x)
    mean, comps, _ = pca_fit(df, "embedding", k=3)
    got = {r["vec_id"]: np.array(r["pc"])
           for r in pca_project(df, "vec_id", "embedding",
                                mean, comps).collect()}
    want = (x - mean) @ comps.T
    for i in range(len(x)):
        np.testing.assert_allclose(got[i], want[i], rtol=1e-10, atol=1e-12)


def test_covariance_empty_raises(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        covariance_stats(df, "embedding")


def test_pca_power_fit_parity_and_alignment(spark):
    """2-round power iteration matches a local numpy replay exactly,
    and (given a real spectral gap) aligns with eigh's top component."""
    import numpy as np

    from ai_incident_analyst_spark.operators.pca import (
        covariance_stats,
        pca_fit,
        pca_power_fit,
    )
    rng = np.random.default_rng(41)
    base = rng.normal(size=(300, 8))
    base[:, 0] *= 6.0  # dominant direction
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(base)],
        "vec_id long, embedding array<double>")
    mean, v = pca_power_fit(df, "embedding", iters=2)
    _, mean2, cov = covariance_stats(df, "embedding")
    ref = np.ones(8)
    for _ in range(2):
        ref = cov @ ref
        ref = ref / np.linalg.norm(ref)
    np.testing.assert_allclose(v, ref, rtol=1e-12)
    _, comps, _ = pca_fit(df, "embedding", k=1)
    assert abs(float(np.dot(v, comps[0]))) > 0.95


def test_pca_deflate_fit_aligns_with_eigh(spark):
    """The oracle-checkable deflation fit must track the exact eigh
    components: |cos| alignment per component on data with clear
    spectral gaps, and monotone (non-increasing) captured variance."""
    from ai_incident_analyst_spark.operators.pca import pca_deflate_fit

    rng = np.random.default_rng(11)
    # anisotropic Gaussian: variances 25, 9, 1, 0.04 along rotated axes
    q, _ = np.linalg.qr(rng.normal(size=(4, 4)))
    x = rng.normal(size=(300, 4)) * np.array([5.0, 3.0, 1.0, 0.2]) @ q.T
    df = _frame(spark, x)
    mean_e, comps_e, _ = pca_fit(df, "embedding", k=3)
    mean_d, comps_d = pca_deflate_fit(df, "embedding", k=3, iters=8)
    np.testing.assert_allclose(mean_d, mean_e, rtol=1e-12)
    for c in range(3):
        align = abs(float(comps_d[c] @ comps_e[c]))
        assert align > 0.99, (c, align)
    # captured variance (Rayleigh quotients) non-increasing
    cov = np.cov(x.T, bias=True)
    lams = [float(v @ cov @ v) for v in comps_d]
    assert lams == sorted(lams, reverse=True)


def test_pca_deflate_fit_deterministic_and_guarded(spark):
    from ai_incident_analyst_spark.operators.pca import pca_deflate_fit

    rng = np.random.default_rng(12)
    x = rng.normal(size=(80, 5))
    df = _frame(spark, x)
    m1, c1 = pca_deflate_fit(df, "embedding", k=2, iters=2)
    m2, c2 = pca_deflate_fit(_frame(spark, x, parts=9), "embedding",
                             k=2, iters=2)
    # partitioning-invariant up to FP noise in the partial sums
    np.testing.assert_allclose(c1, c2, atol=1e-9)
    with pytest.raises(ValueError):
        pca_deflate_fit(df, "embedding", k=0)
    with pytest.raises(ValueError):
        pca_deflate_fit(df, "embedding", k=2, iters=0)
