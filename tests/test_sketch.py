"""Count-min sketch: overcount-only guarantee, exactness at low load,
and the merge property that lets per-window sketches roll up."""

from pyspark.sql import functions as F

from ai_incident_analyst_spark.operators.sketch import (
    cms_build,
    cms_estimate,
    cms_merge,
)


def _df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "k long")


def test_cms_never_undercounts_and_exact_when_sparse(spark):
    keys = [1] * 50 + [2] * 30 + [3] * 7 + list(range(100, 120))
    df = _df(spark, keys)
    sk = cms_build(df, "k", depth=4, width=2048)
    probes = df.select("k").distinct()
    est = {r.k: r.est_count
           for r in cms_estimate(sk, probes, "k", 4, 2048).collect()}
    exact = {r.k: r.c for r in
             df.groupBy("k").agg(F.count("*").alias("c")).collect()}
    for k, c in exact.items():
        assert est[k] >= c, (k, est[k], c)
    # 23 distinct keys in 4x2048 cells: collisions essentially impossible
    assert est == exact


def test_cms_merge_equals_combined_build(spark):
    a, b = _df(spark, [1, 1, 2, 5]), _df(spark, [1, 3, 5, 5])
    merged = cms_merge(cms_build(a, "k", 4, 64), cms_build(b, "k", 4, 64))
    full = cms_build(a.unionByName(b), "k", 4, 64)
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, full.collect()))


def test_cms_absent_key_estimates_zero_when_sparse(spark):
    sk = cms_build(_df(spark, [1, 2, 3]), "k", depth=4, width=4096)
    est = cms_estimate(sk, _df(spark, [999]), "k", 4, 4096).first()
    assert est.est_count == 0


# --- Bloom filter -----------------------------------------------------------

from ai_incident_analyst_spark.operators.sketch import (  # noqa: E402
    bloom_build,
    bloom_merge,
    bloom_prune,
)


def test_bloom_no_false_negatives(spark):
    keys = _df(spark, range(0, 500, 3))
    bits = bloom_build(keys, "k", num_bits=4096, num_hashes=3)
    probe = _df(spark, range(0, 500))
    kept = {r.k for r in
            bloom_prune(probe, "k", bits, 4096, 3).collect()}
    assert set(range(0, 500, 3)) <= kept  # every true key survives


def test_bloom_prunes_most_absent_keys(spark):
    keys = _df(spark, range(100))
    bits = bloom_build(keys, "k", num_bits=1 << 14, num_hashes=4)
    probe = _df(spark, range(100, 2100))
    n_fp = bloom_prune(probe, "k", bits, 1 << 14, 4).count()
    # 400/16384 bits set -> FP rate ~ (0.024)^4; generous bound
    assert n_fp <= 5, n_fp


def test_bloom_merge_equals_combined_build(spark):
    a, b = _df(spark, [1, 2, 3]), _df(spark, [3, 4, 5])
    merged = bloom_merge(bloom_build(a, "k", 512, 3),
                         bloom_build(b, "k", 512, 3))
    full = bloom_build(a.unionByName(b), "k", 512, 3)
    assert sorted(r.bit for r in merged.collect()) == \
        sorted(r.bit for r in full.collect())


def test_bloom_prune_is_scan_side_no_shuffle(spark):
    keys = _df(spark, range(50))
    bits = bloom_build(keys, "k", 2048, 3)
    plan = bloom_prune(_df(spark, range(500)), "k", bits, 2048, 3) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure Filter over the scan


# --- HyperLogLog ------------------------------------------------------------

from ai_incident_analyst_spark.operators.sketch import (  # noqa: E402
    hll_build,
    hll_estimate,
    hll_merge,
)


def _est(spark, keys, m=256):
    sk = hll_build(_df(spark, keys), "k", m=m)
    return hll_estimate(sk, m=m).first()["est_distinct"]


def test_hll_estimate_within_error_bound(spark):
    for n in (50, 500, 5000):
        est = _est(spark, range(n))
        assert abs(est - n) / n < 0.25, (n, est)  # 3-4 sigma of 1.04/16


def test_hll_duplicate_insensitive(spark):
    once = _est(spark, range(300))
    thrice = _est(spark, list(range(300)) * 3)
    assert once == thrice


def test_hll_merge_equals_combined_build(spark):
    a, b = list(range(200)), list(range(100, 400))
    merged = hll_merge(hll_build(_df(spark, a), "k"),
                       hll_build(_df(spark, b), "k"))
    full = hll_build(_df(spark, a + b), "k")
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, full.collect()))


def test_hll_partitioning_invariant(spark):
    """The estimate must not depend on data layout (exact-arithmetic sum)."""
    df1 = _df(spark, range(1000)).coalesce(1)
    df4 = _df(spark, range(1000)).repartition(7)
    e1 = hll_estimate(hll_build(df1, "k")).first()["est_distinct"]
    e4 = hll_estimate(hll_build(df4, "k")).first()["est_distinct"]
    assert e1 == e4


def test_hll_small_range_linear_counting(spark):
    # tiny cardinality -> linear-counting branch; near-exact there
    est = _est(spark, range(10))
    assert abs(est - 10) <= 1.5, est


def test_hll_grouped_coarsen_equals_direct_build(spark):
    """month-from-daily == month-from-raw: the rollup algebra is lossless."""
    from ai_incident_analyst_spark.operators.sketch import (
        hll_build_grouped, hll_estimate_grouped, hll_merge_grouped)
    import pyspark.sql.functions as F
    rows = [(d % 3, d % 7, d * 13 % 50) for d in range(500)]
    df = spark.createDataFrame(rows, "g long, day long, user long")
    daily = hll_build_grouped(df, ["g", "day"], "user")
    coarse = hll_merge_grouped(daily, ["g"])
    direct = hll_build_grouped(df, ["g"], "user")
    assert sorted(map(tuple, coarse.collect())) == \
        sorted(map(tuple, direct.collect()))
    est = {r["g"]: r["est_distinct"]
           for r in hll_estimate_grouped(coarse, ["g"]).collect()}
    exact = {r["g"]: r["n"] for r in
             df.groupBy("g").agg(F.countDistinct("user").alias("n")).collect()}
    for g in exact:
        assert abs(est[g] - exact[g]) / exact[g] < 0.3


def test_hll_intersect_estimate_tracks_truth(spark):
    from ai_incident_analyst_spark.operators.sketch import (
        hll_intersect_estimate,
    )
    # |A|=600, |B|=500, true overlap 300
    a = hll_build(_df(spark, range(0, 600)), "k")
    b = hll_build(_df(spark, range(300, 800)), "k")
    row = hll_intersect_estimate(a, b).first()
    assert abs(row["est_a"] - 600) / 600 < 0.25
    assert abs(row["est_b"] - 500) / 500 < 0.25
    assert abs(row["est_union"] - 800) / 800 < 0.25
    # intersection compounds three estimators' noise: loose bound
    assert abs(row["est_intersect"] - 300) < 300 * 0.6
    # identity: disjoint sets -> intersect estimate near zero
    c = hll_build(_df(spark, range(10_000, 10_400)), "k")
    d = hll_intersect_estimate(a, c).first()
    assert abs(d["est_intersect"]) < 0.25 * 600


def test_histogram_quantile_edges(spark):
    """q=0 must return the first non-empty bucket's edge (the min), not an
    empty frame; q=1 the max edge; out-of-range q raises."""
    import pytest

    from ai_incident_analyst_spark.operators.sketch import (
        histogram_quantile_grouped,
    )
    df = spark.createDataFrame(
        [("a", float(v)) for v in range(1, 101)] + [("b", 7.0), ("b", 7.0)],
        "g string, v double")
    q0 = {r.g: r.est_quantile for r in histogram_quantile_grouped(
        df, ["g"], "v", 0.0, buckets=100).collect()}
    assert q0["a"] == 1.0 and q0["b"] == 7.0   # degenerate group too
    q1 = {r.g: r.est_quantile for r in histogram_quantile_grouped(
        df, ["g"], "v", 1.0, buckets=100).collect()}
    assert abs(q1["a"] - 100.0) < 1.0
    with pytest.raises(ValueError):
        histogram_quantile_grouped(df, ["g"], "v", 1.5)


def test_histogram_sketch_merge_equals_direct(spark):
    """Merging fine-grained sketches must give byte-identical quantiles
    to building one sketch directly over the union — the rollup
    guarantee; range clamp and validation behave."""
    import pytest

    from ai_incident_analyst_spark.operators.sketch import (
        histogram_sketch_build,
        histogram_sketch_merge,
        histogram_sketch_quantile,
    )
    rows = [("a", d, float((i * 13) % 97)) for d in ("d1", "d2", "d3")
            for i in range(200)] + [("a", "d1", 250.0), ("a", "d2", -5.0)]
    df = spark.createDataFrame(rows, "g string, day string, v double")

    fine = histogram_sketch_build(df, ["g", "day"], "v", 0.0, 100.0, 200)
    merged = histogram_sketch_merge(fine, ["g"])
    direct = histogram_sketch_build(df, ["g"], "v", 0.0, 100.0, 200)
    for q in (0.0, 0.5, 0.95, 1.0):
        a = histogram_sketch_quantile(merged, ["g"], q, 0.0, 100.0, 200) \
            .first().est_quantile
        b = histogram_sketch_quantile(direct, ["g"], q, 0.0, 100.0, 200) \
            .first().est_quantile
        assert a == b, (q, a, b)
    # median of 0..96-ish values within a bucket width of the true median
    med = histogram_sketch_quantile(merged, ["g"], 0.5, 0.0, 100.0, 200) \
        .first().est_quantile
    assert abs(med - 48.0) < 2.0
    with pytest.raises(ValueError):
        histogram_sketch_build(df, ["g"], "v", 5.0, 5.0)
