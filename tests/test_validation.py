"""Data-quality expectation suite: hand-computed violation fractions."""

import pytest

from ai_incident_analyst_spark.operators.validation import (
    accepted_values,
    assert_checks,
    in_range,
    not_null,
    referential,
    run_checks,
    unique,
)

pytestmark = pytest.mark.usefixtures("spark")


def _report(df, checks):
    return {(r["check"], r["column"]): (r["violation_frac"], r["passed"])
            for r in run_checks(df, checks).collect()}


def test_row_local_checks(spark):
    df = spark.createDataFrame(
        [(1, 5.0, "a"), (2, 50.0, "b"), (None, -1.0, "c"), (2, None, "a")],
        "id long, v double, s string")
    got = _report(df, [
        not_null("id"),
        in_range("v", 0.0, 10.0),
        accepted_values("s", ["a", "b"]),
        unique("id"),
    ])
    assert got[("not_null", "id")] == (0.25, False)
    # v violations: 50.0 out of range, -1.0 out of range, NULL -> 3/4
    assert got[("in_range", "v")] == (0.75, False)
    assert got[("accepted_values", "s")] == (0.25, False)
    # ids: [1, 2, None, 2] -> violations are the NULL row and the
    # second 2: n - count_distinct = 4 - 2 = 2 -> 0.5
    assert got[("unique", "id")] == (0.5, False)


def test_passing_table(spark):
    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "id long, v double")
    got = _report(df, [not_null("id"), unique("id"),
                       in_range("v", 0.0, 5.0)])
    assert all(p for _, p in got.values())
    assert all(v == 0.0 for v, _ in got.values())


def test_referential_orphans(spark):
    fact = spark.createDataFrame([(1,), (2,), (3,), (None,)], "k long")
    dim = spark.createDataFrame([(1,), (2,)], "k long")
    got = _report(fact, [referential("k", dim, "k", threshold=0.3)])
    # one orphan (3) out of 4 rows; NULL fk is not an orphan here
    assert got[("referential", "k")] == (0.25, True)


def test_threshold_tolerance(spark):
    df = spark.createDataFrame([(1,), (None,), (2,), (3,)], "id long")
    got = _report(df, [not_null("id", threshold=0.5)])
    assert got[("not_null", "id")] == (0.25, True)


def test_assert_checks_raises_with_failures(spark):
    df = spark.createDataFrame([(None,)], "id long")
    with pytest.raises(ValueError, match="not_null"):
        assert_checks(df, [not_null("id")])
    ok = spark.createDataFrame([(1,)], "id long")
    assert assert_checks(ok, [not_null("id")]).count() == 1


def test_empty_table_vacuously_passes(spark):
    df = spark.createDataFrame([], "id long, v double")
    got = _report(df, [not_null("id"), unique("id"),
                       in_range("v", 0.0, 1.0)])
    assert all(p for _, p in got.values())


def test_unknown_kind_rejected(spark):
    from ai_incident_analyst_spark.operators.validation import Check
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="unknown check"):
        run_checks(df, [Check("bogus", "id")])


def test_k_anonymity_report(spark):
    from ai_incident_analyst_spark.operators.validation import (
        k_anonymity_report,
    )
    rows = [("a", 1)] * 5 + [("b", 1)] * 2 + [("c", 2)]
    df = spark.createDataFrame(rows, "qa string, qb long")
    r = k_anonymity_report(df, ["qa", "qb"], k=3).first()
    assert r["min_group_size"] == 1
    assert r["n_rows"] == 8
    assert r["n_violating_rows"] == 3  # the 2-row and 1-row classes
    assert r["violating_frac"] == round(3 / 8, 9)
    assert not r["anonymous"]
    ok = k_anonymity_report(df.filter("qa = 'a'"), ["qa", "qb"], k=3).first()
    assert ok["anonymous"]
    with pytest.raises(ValueError):
        k_anonymity_report(df, [], k=3)


def test_l_diversity_hand_computed(spark):
    from ai_incident_analyst_spark.operators.validation import (
        l_diversity_report,
    )

    rows = [
        # class (a): sensitive values {x, y} -> diversity 2
        ("a", "x"), ("a", "y"), ("a", "x"),
        # class (b): homogeneous -> diversity 1, 2 rows violate at l=2
        ("b", "x"), ("b", "x"),
        # class (c): {x, y, z} -> diversity 3
        ("c", "x"), ("c", "y"), ("c", "z"),
    ]
    df = spark.createDataFrame(rows, "qi string, s string")
    r = l_diversity_report(df, ["qi"], "s", l=2).first()
    assert (r["l"], r["min_diversity"], r["n_classes"]) == (2, 1, 3)
    assert (r["n_violating_classes"], r["n_violating_rows"]) == (1, 2)
    assert r["diverse"] is False
    r3 = l_diversity_report(df, ["qi"], "s", l=3).first()
    assert r3["n_violating_classes"] == 2
    assert r3["n_violating_rows"] == 5
    ok = l_diversity_report(df, ["qi"], "s", l=1).first()
    assert ok["diverse"] is True


def test_l_diversity_guards(spark):
    import pytest as _pt

    from ai_incident_analyst_spark.operators.validation import (
        l_diversity_report,
    )

    df = spark.createDataFrame([("a", "x")], "qi string, s string")
    with _pt.raises(ValueError):
        l_diversity_report(df, [], "s")
    with _pt.raises(ValueError):
        l_diversity_report(df, ["qi", "s"], "s")


def test_t_closeness_report_hand_computed(spark):
    from ai_incident_analyst_spark.operators.validation import (
        t_closeness_report,
    )

    # global: a=4, b=2, c=2 over 8 rows -> Q = (.5, .25, .25)
    # class X (qi=1): a,a,b,c -> P=(.5,.25,.25)  EMD=0
    # class Y (qi=2): a,a,b,c -> same            EMD=0
    # replace one: class Z (qi=3) all 'a'        EMD = (|.5|+|.75|)/2
    rows = [(1, "a"), (1, "a"), (1, "b"), (1, "c"),
            (2, "a"), (2, "a"), (2, "b"), (2, "c"),
            (3, "a"), (3, "a"), (3, "a"), (3, "a")]
    df = spark.createDataFrame(rows, "qi int, s string")
    r = t_closeness_report(df, ["qi"], "s", t=0.2).collect()[0]
    # recompute Q with class Z included: a=8/12, b=2/12, c=2/12
    # class 1/2 P=(.5,.25,.25): cum diffs (-1/6, -1/12+1/12... ) do the math:
    # Q=(2/3,1/6,1/6); P=(1/2,1/4,1/4): cum=(-1/6,-1/12,0) -> EMD=(1/6+1/12)/2=0.125
    # class 3 P=(1,0,0): cum=(1/3,1/6,0) -> EMD=(1/3+1/6)/2=0.25
    assert r["m_values"] == 3
    assert r["n_classes"] == 3
    assert r["max_emd"] == pytest.approx(0.25, abs=1e-6)
    assert r["n_violating_classes"] == 1
    assert r["n_violating_rows"] == 4
    assert bool(r["close"]) is False


def test_t_closeness_identical_distributions_close(spark):
    from ai_incident_analyst_spark.operators.validation import (
        t_closeness_report,
    )

    rows = [(q, s) for q in (1, 2) for s in ("a", "a", "b")]
    df = spark.createDataFrame(rows, "qi int, s string")
    r = t_closeness_report(df, ["qi"], "s", t=0.05).collect()[0]
    assert r["max_emd"] == 0.0
    assert bool(r["close"]) is True


def test_t_closeness_rejects_degenerate_args(spark):
    from ai_incident_analyst_spark.operators.validation import (
        t_closeness_report,
    )

    df = spark.createDataFrame([(1, "a")], "qi int, s string")
    with pytest.raises(ValueError):
        t_closeness_report(df, [], "s")
    with pytest.raises(ValueError):
        t_closeness_report(df, ["s"], "s")


def test_fd_report_hand_truths(spark):
    from ai_incident_analyst_spark.operators.validation import fd_report

    rows = [(1, "a", 10), (2, "a", 10), (3, "b", 20), (3, "b", 20),
            (4, "c", 20), (4, "d", 20)]
    df = spark.createDataFrame(rows, "k int, s string, v int")
    out = {(r["lhs"], r["rhs"]): r for r in fd_report(
        df, [("k", "s"), ("s", "v"), ("v", "k")]).collect()}
    # k -> s fails only at k=4 ({'c','d'})
    r = out[("k", "s")]
    assert (r["n_lhs"], r["n_violating_lhs"], bool(r["holds"])) == (4, 1, False)
    # s -> v holds: a->10, b->20, c->20, d->20
    r = out[("s", "v")]
    assert (r["n_lhs"], r["n_violating_lhs"], bool(r["holds"])) == (4, 0, True)
    # v -> k fails twice: 10 -> {1, 2} and 20 -> {3, 4}
    r = out[("v", "k")]
    assert (r["n_violating_lhs"], bool(r["holds"])) == (2, False)
    with pytest.raises(ValueError):
        fd_report(df, [])


def test_dp_noisy_counts_mechanism(spark):
    from ai_incident_analyst_spark.operators.validation import (
        dp_noisy_counts,
    )

    import math

    rows = [(g,) for g in ["a"] * 100 + ["b"] * 50 + ["c"] * 3]
    df = spark.createDataFrame(rows, "g string")
    out = {r["g"]: r["noisy_count"]
           for r in dp_noisy_counts(df, ["g"], epsilon=1.0).collect()}
    assert set(out) == {"a", "b", "c"}

    # python replay of the exact inverse-CDF draw
    import hashlib

    def replay(g, n, eps=1.0, salt="dp"):
        h = hashlib.md5(f"{salt}:{g}".encode()).hexdigest()
        u = (int(h[:13], 16) + 0.5) / float(16 ** 13)
        p = math.exp(-eps)
        for k in range(-60, 61):
            cdf = (p ** (-k) / (1 + p) if k < 0
                   else 1.0 - p ** (k + 1) / (1 + p))
            if cdf >= u:
                return max(n + k, 0)
        raise AssertionError("lattice exhausted")

    assert out == {"a": replay("a", 100), "b": replay("b", 50),
                   "c": replay("c", 3)}
    # noise at eps=1 stays small: within ~15 of truth whp (fixed seed)
    assert abs(out["a"] - 100) <= 15
    # clamp: counts never go negative
    assert all(v >= 0 for v in out.values())
    # different salt -> different draw (overwhelmingly)
    other = {r["g"]: r["noisy_count"]
             for r in dp_noisy_counts(df, ["g"], epsilon=1.0,
                                      salt="x").collect()}
    assert other != out
    with pytest.raises(ValueError):
        dp_noisy_counts(df, ["g"], epsilon=0.0)


def test_dp_noisy_counts_tail_clamps_not_drops(spark):
    """At small epsilon the truncated-lattice tail is common; a group
    whose u exceeds CDF(max_k) must CLAMP at +max_k, not vanish from
    the release (advice r8: silent group loss from a privacy
    mechanism)."""
    from ai_incident_analyst_spark.operators.validation import (
        dp_noisy_counts,
    )

    import hashlib
    import math

    groups = [f"g{i:03d}" for i in range(120)]
    rows = [(g,) for g in groups for _ in range(10)]
    df = spark.createDataFrame(rows, "g string")
    eps = 0.02
    out = {r["g"]: r["noisy_count"]
           for r in dp_noisy_counts(df, ["g"], epsilon=eps,
                                    salt="dp").collect()}
    # every input group appears in the release — no silent drops
    assert set(out) == set(groups)

    # at least one group actually drew into the clamped tail (the test
    # is vacuous otherwise), and that group's count equals n + max_k
    p = math.exp(-eps)
    cdf_max = 1.0 - p ** 61 / (1 + p)
    tail = []
    for g in groups:
        h = hashlib.md5(f"dp:{g}".encode()).hexdigest()
        u = (int(h[:13], 16) + 0.5) / float(16 ** 13)
        if u > cdf_max:
            tail.append(g)
    assert tail, "fixture produced no tail draw; widen the group list"
    for g in tail:
        assert out[g] == 10 + 60, (g, out[g])
