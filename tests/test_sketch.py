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
