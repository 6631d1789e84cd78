"""exact_percentiles must agree with the built-in F.percentile —
bit-identical interpolated values — on every distribution shape,
because psi_report's oracle (DuckDB quantile_cont) assumes exactly
that interpolation."""

import math

import pytest
from pyspark.sql import functions as F

from ai_incident_analyst_spark.operators.quantiles import exact_percentiles

PROBS = [0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99]


def _builtin(spark_df, col, probs):
    row = spark_df.agg(*[F.percentile(F.col(col).cast("double"),
                                      F.lit(p)).alias(f"p{i}")
                         for i, p in enumerate(probs)]).first()
    return [row[f"p{i}"] for i in range(len(probs))]


def _check(spark, values, probs=PROBS, **kw):
    df = spark.createDataFrame([(float(v),) for v in values], "x double")
    got = exact_percentiles(df, "x", probs, **kw)
    want = _builtin(df, "x", probs)
    for g, w in zip(got, want):
        assert g == w, (g, w)


def test_uniform_distinct(spark):
    import random
    rng = random.Random(7)
    _check(spark, [rng.uniform(1000, 500000) for _ in range(5000)])


def test_heavy_ties(spark):
    import random
    rng = random.Random(8)
    _check(spark, [rng.choice([1.0, 2.0, 2.0, 3.0, 100.0])
                   for _ in range(3000)])


def test_skewed_exponential(spark):
    import random
    rng = random.Random(9)
    _check(spark, [rng.expovariate(1 / 50.0) for _ in range(4000)])


def test_negative_and_mixed(spark):
    import random
    rng = random.Random(10)
    _check(spark, [rng.gauss(-100, 500) for _ in range(2500)])


def test_tiny_frames(spark):
    _check(spark, [42.0])
    _check(spark, [1.0, 2.0])
    _check(spark, [5.0, 5.0, 5.0])   # lo == hi fast path


def test_empty_returns_nones(spark):
    df = spark.createDataFrame([], "x double")
    assert exact_percentiles(df, "x", PROBS) == [None] * len(PROBS)


def test_nulls_and_nans_ignored(spark):
    df = spark.createDataFrame(
        [(1.0,), (None,), (float("nan"),), (2.0,), (3.0,), (4.0,)],
        "x double")
    got = exact_percentiles(df, "x", [0.5])
    assert got == [2.5]


def test_refinement_path_exercised(spark):
    """cap + coarse_bins tiny enough that the located bucket MUST be
    refined at least once before collection."""
    import random
    rng = random.Random(11)
    vals = [rng.uniform(0, 1) for _ in range(2000)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = exact_percentiles(df, "x", [0.5, 0.9],
                            coarse_bins=4, cap=50)
    want = _builtin(df, "x", [0.5, 0.9])
    assert got == want


def test_extreme_skew_all_one_bucket(spark):
    """All mass in one coarse bucket plus one far outlier — the walk
    must still locate and refine correctly."""
    vals = [1.0 + i * 1e-9 for i in range(1000)] + [1e12]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = exact_percentiles(df, "x", [0.5], coarse_bins=8, cap=100)
    want = _builtin(df, "x", [0.5])
    assert got == want


def test_heavy_ties_above_cap(spark):
    """A single value occurring more often than ``cap`` rows must
    resolve directly (min == max bucket) instead of refining forever —
    the round-10 convergence bug: 200 copies of 5.0 with cap=50 raised
    'failed to converge' because equal-width refinement can never split
    a bucket of identical values."""
    vals = [5.0] * 200 + [1.0, 2.0, 9.0]
    _check(spark, vals, probs=[0.1, 0.5, 0.9], coarse_bins=8, cap=50)


def test_all_ranks_inside_tie_block_above_cap(spark):
    """Every requested rank lands inside the over-cap tie block."""
    _check(spark, [7.0] * 300 + [0.0, 100.0],
           probs=[0.25, 0.5, 0.75], coarse_bins=4, cap=20)


def test_ulp_dense_heavy_bucket(spark):
    """More than ``cap`` rows spread over adjacent representable
    doubles: the sub-range width underflows to 0 so the bucket cannot
    be subdivided — must resolve exactly from value->count instead of
    looping."""
    a = 1.0
    b = math.nextafter(a, 2.0)
    c = math.nextafter(b, 2.0)
    vals = [a] * 40 + [b] * 40 + [c] * 40 + [500.0]
    _check(spark, vals, probs=[0.1, 0.3, 0.5, 0.9],
           coarse_bins=4, cap=30)


def test_full_double_range_span(spark):
    """hi - lo overflows to +inf: the width must be computed without
    overflow so the bucket walk still makes progress."""
    big = 1.7e308
    vals = [-big, big] + [float(v) for v in range(100)]
    _check(spark, vals, probs=[0.05, 0.5, 0.95], coarse_bins=16, cap=8)


def test_exact_kth_smallest_matches_sorted(spark):
    """exact_kth_smallest(k) == sorted(values)[k-1] on every shape,
    including heavy ties and k at both ends."""
    import random

    from ai_incident_analyst_spark.operators.quantiles import (
        exact_kth_smallest,
    )
    rng = random.Random(13)
    vals = ([rng.uniform(-100, 100) for _ in range(800)]
            + [7.0] * 300 + [None, float("nan")])
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    clean = sorted(v for v in vals
                   if v is not None and v == v)
    for k in (1, 2, 57, 550, 1100, len(clean)):
        got = exact_kth_smallest(df, "x", k, coarse_bins=16, cap=40)
        assert got == clean[k - 1], (k, got, clean[k - 1])


def test_exact_kth_smallest_edges(spark):
    from ai_incident_analyst_spark.operators.quantiles import (
        exact_kth_smallest,
    )
    empty = spark.createDataFrame([], "x double")
    assert exact_kth_smallest(empty, "x", 1) is None
    df = spark.createDataFrame([(3.0,), (1.0,)], "x double")
    assert exact_kth_smallest(df, "x", 1) == 1.0
    assert exact_kth_smallest(df, "x", 2) == 3.0
    with pytest.raises(ValueError, match="out of range"):
        exact_kth_smallest(df, "x", 3)
    with pytest.raises(ValueError, match="out of range"):
        exact_kth_smallest(df, "x", 0)


def test_psi_report_matches_duckdb_shape(spark, sf_dir):
    """psi_report end-to-end on real testdata after the boundary-path
    swap: identical output to the pre-swap contract (boundaries equal
    F.percentile, bins strict->)."""
    import duckdb

    from ai_incident_analyst_spark.operators.divergence import psi_report
    from ai_incident_analyst_spark.sources.tables import load_table
    orders = load_table(spark, sf_dir, "orders")
    cut = F.lit("1998-01-01").cast("timestamp")
    out = psi_report(orders.where(F.col("o_orderdate") < cut),
                     orders.where(F.col("o_orderdate") >= cut),
                     "o_totalprice", n_bins=10, alpha=0.5)
    rows = {r["bin"]: r for r in out.collect()}
    assert len(rows) == 10
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{sf_dir}/orders.parquet')")
    qcs = ", ".join(f"quantile_cont(v, {i / 10})" for i in range(1, 10))
    want = con.execute(f"""
      WITH b AS (SELECT o_totalprice v FROM orders
                 WHERE o_orderdate < TIMESTAMP '1998-01-01'),
      bounds AS (SELECT list_value({qcs}) AS qs FROM b),
      binned AS (SELECT len(list_filter(bounds.qs, q -> b.v > q)) AS bin
                 FROM b, bounds)
      SELECT bin, count(*) n FROM binned GROUP BY bin ORDER BY bin
    """).fetchall()
    for bin_, n in want:
        assert rows[bin_]["n_base"] == n, (bin_, n)
    total = out.select("psi").first()["psi"]
    assert total is not None and not math.isnan(total)


def test_group_quantiles_matches_builtin(spark):
    """The window-sort group_quantiles must return bit-identical values
    to the built-in per-group percentile aggregate it replaced."""
    import random

    from ai_incident_analyst_spark.operators.robust import group_quantiles
    rng = random.Random(12)
    rows = [(rng.choice("abcde"), rng.uniform(1000, 500000))
            for _ in range(4000)]
    rows += [("f", 42.0)]                      # singleton group
    rows += [("g", 7.0), ("g", 7.0), ("g", 7.0)]   # all-ties group
    df = spark.createDataFrame(rows, "k string, x double")
    probs = [0.05, 0.5, 0.95, 0.99]
    got = {r["k"]: [r[f"q_{str(p).replace('.', '_')}"] for p in probs]
           for r in group_quantiles(df, "k", "x", probs).collect()}
    want = {r["k"]: [r[f"p{i}"] for i in range(len(probs))]
            for r in df.groupBy("k").agg(
                *[F.percentile(F.col("x"), F.lit(p)).alias(f"p{i}")
                  for i, p in enumerate(probs)]).collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k] == want[k], (k, got[k], want[k])


def test_group_quantiles_ignores_nulls(spark):
    from ai_incident_analyst_spark.operators.robust import group_quantiles
    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 3.0)], "k string, x double")
    row = group_quantiles(df, "k", "x", [0.5]).first()
    assert row["q_0_5"] == 2.0
