"""Robust statistics: per-group winsorization and MAD outlier flagging.

The value-column hygiene pass of a metrics/training pipeline: clamp the
tails so one corrupt sensor reading doesn't dominate a mean (winsorize),
and flag rows that sit implausibly far from their group's center by the
median-absolute-deviation rule — the robust z-score that, unlike the
stddev z-test in ``operators/temporal.anomalous_buckets``, is itself
immune to the outliers it hunts (breakdown point 50% vs 0%).

All statistics are EXACT interpolated quantiles (Spark ``percentile``,
one extra sort-based agg per group — identical semantics to DuckDB
``quantile_cont``, the parity ``nrql_percentile_latest`` already
proves), so both operators hash-match an independent SQL twin.

Plan shape: one grouped quantile aggregation (map-side partial sort
within Spark's ObjectHashAggregate), result is group-cardinality —
joined back AQE-broadcast. MAD needs a second pass for the deviation
median (it depends on the first median); two scans total, no window
over the raw values, nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def group_quantiles(df: DataFrame, key: str, value_col: str,
                    probs: list[float]) -> DataFrame:
    """Exact interpolated quantiles per group:
    ``(key, q_<p> ...)`` — same values as ``F.percentile`` per group
    (NULL/NaN values ignored), computed by WINDOW-SORT instead of the
    built-in ``percentile`` aggregate.

    The built-in buffers each group's value multiset in aggregation
    state — O(total distinct values) heap however many groups there
    are; the r10 sf10 probe measured winsorized_order_totals (5 groups
    x 3M near-distinct doubles) at 74 s warm on that path. Here the
    engine instead range-sorts within each group (one keyed shuffle,
    streaming window state, spills gracefully) and the interpolated
    quantile v[k]*(1-frac) + v[k+1]*frac is assembled from the two
    order-statistic rows each prob needs: rank columns mark them, a
    plain groupBy picks them out. Exactness vs the built-in is pinned
    by tests/test_quantiles.py."""
    v = F.col(value_col).cast("double")
    base = (df.select(F.col(key).alias(key), v.alias("__v"))
            .where(v.isNotNull() & ~F.isnan(v)))
    w = Window.partitionBy(key).orderBy("__v")
    marked = (base
              .withColumn("__rn", F.row_number().over(w) - 1)
              .withColumn("__n", F.count("*").over(
                  Window.partitionBy(key))))
    aggs = []
    for p in probs:
        name = f"q_{str(p).replace('.', '_')}"
        r0 = F.lit(p) * (F.col("__n") - 1)
        k = F.floor(r0).cast("long")
        frac = r0 - k
        lo = F.max(F.when(F.col("__rn") == k, F.col("__v")))
        hi = F.max(F.when(
            F.col("__rn") == F.least(k + 1, F.col("__n") - 1),
            F.col("__v")))
        fr = F.max(F.when(F.col("__rn") == k, frac))
        aggs.append((lo * (1 - fr) + hi * fr).alias(name))
    return marked.groupBy(key).agg(*aggs)


def winsorize(df: DataFrame, key: str, value_col: str,
              p_lo: float = 0.01, p_hi: float = 0.99,
              out_col: str | None = None) -> DataFrame:
    """Clamp ``value_col`` into its group's [p_lo, p_hi] quantile range
    (appended as ``out_col``, default ``<value>_w``)."""
    out = out_col or f"{value_col}_w"
    qs = group_quantiles(df, key, value_col, [p_lo, p_hi])
    lo = f"q_{str(p_lo).replace('.', '_')}"
    hi = f"q_{str(p_hi).replace('.', '_')}"
    return (
        df.join(qs, key)
        .withColumn(out, F.least(F.greatest(
            F.col(value_col).cast("double"), F.col(lo)), F.col(hi)))
        .drop(lo, hi)
    )


def mad_outliers(df: DataFrame, key: str, value_col: str,
                 k: float = 3.0) -> DataFrame:
    """Flag rows with ``|x − median| > k · MAD`` within their group
    (appended columns ``group_median``, ``group_mad``, ``is_outlier``).
    Zero-MAD groups (over half the values identical) flag any deviation
    from the median — the conventional degenerate-case rule.
    """
    v = F.col(value_col).cast("double")
    med = (
        df.groupBy(key).agg(F.percentile(v, F.lit(0.5))
                            .alias("group_median"))
    )
    with_med = df.join(med, key)
    mad = (
        with_med.groupBy(key)
        .agg(F.percentile(F.abs(v - F.col("group_median")), F.lit(0.5))
             .alias("group_mad"))
    )
    dev = F.abs(v - F.col("group_median"))
    flag = F.when(F.col("group_mad") > 0,
                  dev > F.lit(float(k)) * F.col("group_mad")) \
        .otherwise(dev > 0)
    return with_med.join(mad, key).withColumn("is_outlier", flag)


def theil_sen_slope(df: DataFrame, key: str, x_col: str,
                    y_col: str) -> DataFrame:
    """Robust trend per key: the Theil–Sen estimator — the median slope
    over all point pairs, ``(key, n_points, slope)``. Breakdown point
    ~29%: one wild day cannot flip the trend the way an OLS fit would,
    which is why it is the standard monitor-series trend test
    (complementing ``cusum_drift``: CUSUM detects THAT a drift happened,
    Theil–Sen quantifies its rate).

    Pair generation self-joins WITHIN the key (x_a < x_b) — Σ|series|²
    pairs, fine for the aggregated-series use (points per key = buckets,
    not raw events; aggregate first). Median is the exact interpolated
    percentile, engine-portable like the rest of this module.
    """
    a = df.select(F.col(key), F.col(x_col).cast("double").alias("xa"),
                  F.col(y_col).cast("double").alias("ya"))
    b = df.select(F.col(key), F.col(x_col).cast("double").alias("xb"),
                  F.col(y_col).cast("double").alias("yb"))
    pairs = (
        a.join(b, key)
        .filter(F.col("xa") < F.col("xb"))
        .withColumn("slope",
                    (F.col("yb") - F.col("ya"))
                    / (F.col("xb") - F.col("xa")))
    )
    n = df.groupBy(key).agg(F.count("*").alias("n_points"))
    med = pairs.groupBy(key).agg(
        F.percentile(F.col("slope"), F.lit(0.5)).alias("slope"))
    return n.join(med, key, "left") \
        .select(key, "n_points", F.round("slope", 6).alias("slope"))


def weighted_median(df: DataFrame, group_col: str, value_col: str,
                    weight_col: str) -> DataFrame:
    """Exact per-group WEIGHTED (lower) median: the smallest value v
    whose cumulative weight reaches half the group's total —
    ``2·cumweight(v) ≥ total``. The robust center for weighted corpora
    (token-weighted quality, quantity-weighted price) that the plain
    median/MAD pair (``mad_outlier`` path) and the approximate
    histogram quantiles can't give when rows carry unequal mass.
    Returns ``(<group_col>, weighted_median, total_weight)``.

    EXACT by construction: weights cast to int64, duplicate values
    pre-aggregated (one groupBy), the threshold compare is pure integer
    arithmetic (``2·cw ≥ tw`` — no halves, no FP), and the output is a
    DATA value — nothing to round, cross-engine identical. Plan: one
    (group, value) groupBy, one per-group cumulative window over the
    group's DISTINCT values, a group-cardinality totals join, and a
    min-over-qualifying aggregate. Per-group sort is the cost — groups
    are the parallelism unit; for one giant group use the mergeable
    histogram quantiles instead (documented tradeoff). Zero/negative
    weights and NULL values are dropped.
    """
    v = F.col(value_col).cast("double")
    w = F.col(weight_col).cast("long")
    g = (df.select(F.col(group_col).alias("g"), v.alias("v"),
                   w.alias("w"))
         .where(F.col("w") > 0)
         .where(F.col("v").isNotNull() & ~F.isnan(F.col("v"))))
    # per_val feeds BOTH the cumulative window and the totals agg —
    # unmarked, each reference re-runs the scan+groupBy; truncate
    # lineage so the scan runs once ((group, value)-cardinality, so the
    # materialization is bounded by the distinct-value count)
    per_val = (g.groupBy("g", "v").agg(F.sum("w").alias("w"))
               .localCheckpoint(eager=False))
    win = (Window.partitionBy("g").orderBy("v")
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = per_val.withColumn("cw", F.sum("w").over(win))
    tot = per_val.groupBy("g").agg(F.sum("w").alias("tw"))
    return (cum.join(tot, "g")
            .groupBy("g")
            .agg(F.min(F.when(2 * F.col("cw") >= F.col("tw"),
                              F.col("v"))).alias("weighted_median"),
                 F.max("tw").alias("total_weight"))
            .select(F.col("g").alias(group_col), "weighted_median",
                    F.col("total_weight").cast("long")
                    .alias("total_weight")))
