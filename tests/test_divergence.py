"""Distribution-divergence operators (operators/divergence.py) against
straight-line math on known distributions."""

import math

import pytest

from ai_incident_analyst_spark.operators.divergence import (
    categorical_divergence,
    entropy_of,
    slice_entropy,
    token_divergence,
)


def _cats(spark, counts):
    rows = [(c,) for c, n in counts.items() for _ in range(n)]
    return spark.createDataFrame(rows, "cat string")


def _smoothed(counts, vocab, s=0.5):
    n = sum(counts.values())
    return {c: (counts.get(c, 0) + s) / (n + s * len(vocab))
            for c in vocab}


def _expected(ca, cb, s=0.5):
    vocab = sorted(set(ca) | set(cb))
    p = _smoothed(ca, vocab, s)
    q = _smoothed(cb, vocab, s)
    kl = lambda x, y: sum(x[c] * math.log(x[c] / y[c]) for c in vocab)
    m = {c: (p[c] + q[c]) / 2 for c in vocab}
    return {
        "kl_ab": kl(p, q), "kl_ba": kl(q, p),
        "js": (kl(p, m) + kl(q, m)) / 2,
        "tvd": sum(abs(p[c] - q[c]) for c in vocab) / 2,
        "xent_ab": -sum(p[c] * math.log(q[c]) for c in vocab),
    }


def test_categorical_divergence_matches_math(spark):
    ca = {"en": 6, "de": 3, "fr": 1}
    cb = {"en": 2, "de": 2, "zh": 4}
    row = categorical_divergence(_cats(spark, ca), _cats(spark, cb),
                                 "cat").collect()[0]
    exp = _expected(ca, cb)
    for k, v in exp.items():
        assert row[k] == pytest.approx(v, abs=1e-6), k
    assert row["n_cats"] == 4


def test_identical_distributions_are_zero(spark):
    ca = {"a": 5, "b": 5}
    row = categorical_divergence(_cats(spark, ca), _cats(spark, ca),
                                 "cat").collect()[0]
    assert row["kl_ab"] == row["kl_ba"] == row["js"] == row["tvd"] == 0.0


def test_slice_entropy(spark):
    df = spark.createDataFrame(
        [("s1", "en")] * 2 + [("s1", "de")] * 2       # uniform: ln 2
        + [("s2", "en")] * 4,                          # degenerate: 0
        "src string, lang string")
    got = {r["src"]: r for r in
           slice_entropy(df, "src", "lang").collect()}
    assert got["s1"]["entropy"] == pytest.approx(math.log(2), abs=1e-6)
    assert got["s1"]["entropy_norm"] == pytest.approx(1.0, abs=1e-6)
    assert got["s2"]["entropy"] == 0.0
    assert got["s2"]["entropy_norm"] == 0.0
    assert entropy_of([2, 2]) == pytest.approx(math.log(2))


def test_token_divergence_vocab_cap(spark):
    a = spark.createDataFrame(
        [("alpha beta beta gamma",)] * 3, "text string")
    b = spark.createDataFrame(
        [("alpha alpha delta x",)] * 3, "text string")  # 'x' too short
    # top_n=3 keeps {alpha, beta, delta or gamma}: counts alpha=9 beta=6
    # gamma=3 delta=3, tie gamma-vs-delta broken by token → delta
    row = token_divergence(a, b, "text", top_n=3).collect()[0]
    assert row["n_cats"] == 3
    exp = _expected({"alpha": 3, "beta": 6}, {"alpha": 6, "delta": 3})
    assert row["js"] == pytest.approx(exp["js"], abs=1e-6)


def test_psi_identical_distributions_near_zero(spark):
    from ai_incident_analyst_spark.operators.divergence import psi_report

    rows = [(float(i % 50),) for i in range(500)]
    df = spark.createDataFrame(rows, "v double")
    out = psi_report(df, df, "v", n_bins=5).collect()
    assert len(out) == 5
    # identical sides: p == q in every bin -> each contrib 0, psi 0
    assert all(r["psi_contrib"] == 0.0 for r in out)
    assert out[0]["psi"] == 0.0


def test_psi_shift_detected_and_hand_checked(spark):
    import math

    from ai_incident_analyst_spark.operators.divergence import psi_report

    base = spark.createDataFrame([(float(i),) for i in range(100)],
                                 "v double")
    # hard shift: everything above the baseline's max -> all current
    # mass lands in the top bin
    cur = spark.createDataFrame([(1000.0 + i,) for i in range(50)],
                                "v double")
    out = {r["bin"]: r for r in
           psi_report(base, cur, "v", n_bins=4, alpha=0.5).collect()}
    assert [out[b]["n_cur"] for b in range(4)] == [0, 0, 0, 50]
    assert [out[b]["n_base"] for b in range(4)] == [25, 25, 25, 25]
    # hand-check bin 0's contribution
    p0 = (25 + 0.5) / (100 + 2.0)
    q0 = (0 + 0.5) / (50 + 2.0)
    want = round((p0 - q0) * math.log(p0 / q0), 6)
    assert out[0]["psi_contrib"] == want
    assert out[0]["psi"] > 0.25     # folklore "act" threshold


def test_psi_guard(spark):
    import pytest as _pt

    from ai_incident_analyst_spark.operators.divergence import psi_report

    df = spark.createDataFrame([(1.0,)], "v double")
    with _pt.raises(ValueError):
        psi_report(df, df, "v", n_bins=1)
