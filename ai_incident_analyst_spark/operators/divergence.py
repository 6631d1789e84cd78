"""Corpus distribution-divergence metrics: KL / Jensen-Shannon / total
variation / cross-entropy between two data slices, plus per-slice
entropy.

Why it belongs in a training-data engine: mixture drift between corpus
snapshots (yesterday's crawl vs today's), between a sampled subset and
its parent, or between per-source slices is the standard gate before a
retrain — and at 100 TB it must reduce to *categorical count
aggregations*, never a row-level comparison. Every operator here is:

    groupBy(category) → count            (one keyed shuffle per side)
    full-outer join on category          (vocab-sized, not corpus-sized)
    one global agg of per-category terms (scalar out)

so the shuffled data volume is O(|vocab|), independent of corpus rows.
Additive smoothing (``smooth``) keeps KL finite when a category appears
on only one side. Final metrics round to ``round_dp`` decimals — the
registry-wide discretization convention for cross-engine float
reproducibility (association-order noise is ~1e-12 on vocab-sized sums,
six orders below the 1e-6 quantum).

The reference has no distribution monitoring (its analytics stop at
group counts, ``src/incident_analyst/analytics.py``); this family is
part of the beyond-reference training-data surface.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dist(df: DataFrame, cat_col: str, p_name: str) -> DataFrame:
    """Category → count, one keyed shuffle; counts stay integers until
    the final smoothed ratio so the join side is exact."""
    return (df.groupBy(F.col(cat_col).cast("string").alias("cat"))
            .agg(F.count(F.lit(1)).alias(p_name)))


def categorical_divergence(a: DataFrame, b: DataFrame, cat_col: str,
                           smooth: float = 0.5,
                           round_dp: int = 6) -> DataFrame:
    """One-row DataFrame with divergence metrics between the categorical
    distributions of ``a`` and ``b`` over ``cat_col``:

    - ``kl_ab`` / ``kl_ba`` — KL(P‖Q), KL(Q‖P), nats;
    - ``js`` — Jensen-Shannon divergence (symmetric, bounded by ln 2);
    - ``tvd`` — total variation distance, ½ Σ|p−q|;
    - ``xent_ab`` — cross-entropy H(P, Q), nats;
    - ``n_cats`` — union vocabulary size.

    Smoothed estimates: p_i = (c_i + s) / (N + s·V) over the union
    vocabulary V, so both distributions are strictly positive and sum to
    one. All arithmetic is in SQL expressions (log/abs/sum) — an
    identically-shaped DuckDB twin reproduces it to well under the
    rounding quantum.
    """
    da, db = _dist(a, cat_col, "ca"), _dist(b, cat_col, "cb")
    joined = (da.join(db, "cat", "full_outer")
              .select("cat",
                      F.coalesce("ca", F.lit(0)).alias("ca"),
                      F.coalesce("cb", F.lit(0)).alias("cb")))
    # vocab + totals: scalar aggregates, broadcast back via crossJoin of
    # a 1-row frame (the registry's standard scalar-anchor shape)
    totals = joined.agg(F.count(F.lit(1)).alias("v"),
                        F.sum("ca").alias("na"),
                        F.sum("cb").alias("nb"))
    j = joined.crossJoin(F.broadcast(totals))
    s = F.lit(float(smooth))
    p = (F.col("ca") + s) / (F.col("na") + s * F.col("v"))
    qq = (F.col("cb") + s) / (F.col("nb") + s * F.col("v"))
    m = (p + qq) / 2
    terms = j.select(
        (p * F.log(p / qq)).alias("t_ab"),
        (qq * F.log(qq / p)).alias("t_ba"),
        ((p * F.log(p / m) + qq * F.log(qq / m)) / 2).alias("t_js"),
        (F.abs(p - qq) / 2).alias("t_tvd"),
        (-p * F.log(qq)).alias("t_xent"),
    )
    return terms.agg(
        F.round(F.sum("t_ab"), round_dp).alias("kl_ab"),
        F.round(F.sum("t_ba"), round_dp).alias("kl_ba"),
        F.round(F.sum("t_js"), round_dp).alias("js"),
        F.round(F.sum("t_tvd"), round_dp).alias("tvd"),
        F.round(F.sum("t_xent"), round_dp).alias("xent_ab"),
        F.count(F.lit(1)).alias("n_cats"))


def slice_entropy(df: DataFrame, slice_col: str, cat_col: str,
                  round_dp: int = 6) -> DataFrame:
    """Shannon entropy (nats) of ``cat_col``'s distribution within each
    ``slice_col`` group, plus the normalized form (entropy / ln V_slice,
    in [0,1]) — the mixture-balance health metric. Two keyed aggs, no
    smoothing (empirical distribution is strictly positive by
    construction)."""
    counts = (df.groupBy(F.col(slice_col).alias("slc"),
                         F.col(cat_col).cast("string").alias("cat"))
              .agg(F.count(F.lit(1)).alias("c")))
    tot = counts.groupBy("slc").agg(F.sum("c").alias("n"),
                                    F.count(F.lit(1)).alias("v"))
    p = F.col("c") / F.col("n")
    return (counts.join(tot, "slc")
            .groupBy("slc", "n", "v")
            .agg(F.sum(-p * F.log(p)).alias("h"))
            .select(F.col("slc").alias(slice_col),
                    F.col("n").alias("n_rows"),
                    F.col("v").alias("n_cats"),
                    F.round("h", round_dp).alias("entropy"),
                    F.round(
                        F.when(F.col("v") > 1,
                               F.col("h") / F.log(F.col("v").cast("double"))
                               ).otherwise(F.lit(0.0)),
                        round_dp).alias("entropy_norm")))


def token_divergence(a: DataFrame, b: DataFrame, text_col: str,
                     top_n: int = 200, smooth: float = 0.5,
                     round_dp: int = 6) -> DataFrame:
    """``categorical_divergence`` over unigram token distributions,
    restricted to the top-``top_n`` tokens of the UNION corpus (ranked
    by total count, ties broken by token) — the restriction bounds the
    join vocabulary at scale and matches how drift monitors cap the
    comparison space. Tokens = lowercased ``\\W+`` splits, length ≥ 2."""
    def toks(df: DataFrame) -> DataFrame:
        t = F.explode(F.split(F.lower(F.col(text_col)), r"\W+")).alias("tok")
        return (df.select(t)
                .where(F.length("tok") >= 2))
    ta, tb = toks(a), toks(b)
    vocab = (ta.unionByName(tb)
             .groupBy("tok").agg(F.count(F.lit(1)).alias("ct"))
             .orderBy(F.desc("ct"), "tok").limit(top_n)
             .select("tok"))
    # vocab is top_n rows — broadcast both semi-joins
    fa = ta.join(F.broadcast(vocab), "tok", "left_semi")
    fb = tb.join(F.broadcast(vocab), "tok", "left_semi")
    return categorical_divergence(fa, fb, "tok",
                                  smooth=smooth, round_dp=round_dp)


def entropy_of(counts: list[int]) -> float:
    """Driver-side helper for tests: exact entropy of a count vector."""
    n = float(sum(counts))
    return -sum((c / n) * math.log(c / n) for c in counts if c > 0)


def psi_report(baseline: DataFrame, current: DataFrame, value_col: str,
               n_bins: int = 10, alpha: float = 0.5,
               round_dp: int = 6) -> DataFrame:
    """Population Stability Index over a NUMERIC feature — the
    production drift monitor for scores and measurements (credit-risk
    folklore thresholds: <0.1 stable, 0.1–0.25 drifting, >0.25 act),
    complementing ``categorical_divergence`` (above), which compares
    CATEGORY distributions and has no notion of a baseline-anchored
    binning.

    Bins are the baseline's ``i/n_bins`` interpolated percentiles (the
    PSI convention: the monitored window is judged against the
    baseline's own quantile grid, so a stable-but-shifted current
    window lights up); a value's bin is the count of boundaries it
    strictly exceeds — ties fall low, integer-exact in every engine
    (the ``curriculum.difficulty_buckets`` rule). Empty bins on either
    side get additive ``alpha`` smoothing so the log ratio stays
    finite.

    Returns one row per bin: ``(bin, n_base, n_cur, psi_contrib,
    psi)`` — ``psi_contrib = (p_b − q_b)·ln(p_b/q_b)`` rounded at
    ``round_dp``; ``psi`` is the total (sum of the ROUNDED contribs,
    re-rounded — a 1-row broadcast anchor, deterministic cross-engine).

    Plan: boundary percentiles via ``operators.quantiles.
    exact_percentiles`` — bounded-memory distributed selection, NOT the
    built-in ``percentile`` aggregate, whose O(distinct-values) state
    the sf10 probe measured at 229 s over ~45M near-distinct doubles
    (the boundaries come back as nine float literals, identical values
    to ``F.percentile`` / DuckDB ``quantile_cont``); then one
    map-side-combined groupBy per side (each collapses to ≤``n_bins``
    rows — the only corpus-sized work is the two scans), an outer join
    on the dense ``spark.range(n_bins)`` bin spine, and the scalar
    total.
    """
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    from .quantiles import exact_percentiles
    spark = baseline.sparkSession
    v = F.col(value_col)
    bs = exact_percentiles(baseline, value_col,
                           [i / n_bins for i in range(1, n_bins)])
    bucket = sum(
        (F.when(v > F.lit(b).cast("double"), 1).otherwise(0)
         for b in bs),
        F.lit(0)).cast("long")

    def side_counts(df: DataFrame, out: str) -> DataFrame:
        return (df.select(bucket.alias("bin"))
                .groupBy("bin").agg(F.count("*").alias(out)))

    spine = spark.range(n_bins).select(F.col("id").alias("bin"))
    # localCheckpoint the ≤n_bins-row bin table: it feeds the totals
    # anchor, the contrib projection AND the final total — unmarked,
    # each reference re-runs both corpus scans (static plan showed 16
    # scans / 35 shuffles for a 10-bin report)
    joined = (spine
              .join(side_counts(baseline, "n_base"), "bin", "left")
              .join(side_counts(current, "n_cur"), "bin", "left")
              .select("bin",
                      F.coalesce("n_base", F.lit(0)).alias("n_base"),
                      F.coalesce("n_cur", F.lit(0)).alias("n_cur"))
              .localCheckpoint(eager=False))
    tot = joined.agg(F.sum("n_base").alias("__tb"),
                     F.sum("n_cur").alias("__tc"))
    a = float(alpha)
    an = a * n_bins
    p = (F.col("n_base") + F.lit(a)) / (F.col("__tb") + F.lit(an))
    q = (F.col("n_cur") + F.lit(a)) / (F.col("__tc") + F.lit(an))
    contrib = joined.crossJoin(F.broadcast(tot)).select(
        "bin", "n_base", "n_cur",
        F.round((p - q) * F.log(p / q), round_dp).alias("psi_contrib"))
    total = contrib.agg(
        F.round(F.sum("psi_contrib"), round_dp).alias("psi"))
    return (contrib.crossJoin(F.broadcast(total))
            .select("bin", "n_base", "n_cur", "psi_contrib", "psi"))


def psi_bucket_expr(baseline: DataFrame, value_col: str,
                    n_bins: int = 10):
    """The FROZEN-grid form of ``psi_report``'s binning: compute the
    baseline's interpolated quantile boundaries ONCE (a tiny aggregate,
    collected — n_bins−1 doubles) and return the integer bucket Column
    they define, usable on any frame carrying ``value_col``. This is
    the deployment contract streaming monitors need
    (``streaming/pipeline.streaming_psi_sink``): the grid must not be
    re-derived per batch, or the monitor silently re-anchors and hides
    drift. Same ties-fall-low strict-``>`` rule as ``psi_report``."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    from .quantiles import exact_percentiles
    bs = exact_percentiles(baseline, value_col,
                           [i / n_bins for i in range(1, n_bins)])
    return sum(
        (F.when(F.col(value_col) > F.lit(float(b)), 1)
         .otherwise(0) for b in bs),
        F.lit(0)).cast("long")


def psi_report_from_counts(baseline: DataFrame, cur_counts: DataFrame,
                           value_col: str, n_bins: int = 10,
                           alpha: float = 0.5,
                           round_dp: int = 6) -> DataFrame:
    """``psi_report`` when the CURRENT side arrives as pre-aggregated
    ``(bin, n_cur)`` counts (a ``streaming_psi_sink`` store) instead of
    raw rows. The baseline is re-binned under its own frozen grid; the
    report columns and 6dp integer-ratio contract match ``psi_report``
    exactly, so streamed-then-scored equals the one-shot batch report
    by bin-count additivity."""
    spark = baseline.sparkSession
    bucket = psi_bucket_expr(baseline, value_col, n_bins)
    base = (baseline.select(bucket.alias("bin"))
            .groupBy("bin").agg(F.count("*").alias("n_base")))
    spine = spark.range(n_bins).select(F.col("id").alias("bin"))
    joined = (spine
              .join(base, "bin", "left")
              .join(cur_counts.groupBy("bin")
                    .agg(F.sum("n_cur").alias("n_cur")), "bin", "left")
              .select("bin",
                      F.coalesce("n_base", F.lit(0)).alias("n_base"),
                      F.coalesce("n_cur", F.lit(0)).alias("n_cur"))
              .localCheckpoint(eager=False))
    tot = joined.agg(F.sum("n_base").alias("__tb"),
                     F.sum("n_cur").alias("__tc"))
    a = float(alpha)
    an = a * n_bins
    p = (F.col("n_base") + F.lit(a)) / (F.col("__tb") + F.lit(an))
    q = (F.col("n_cur") + F.lit(a)) / (F.col("__tc") + F.lit(an))
    contrib = joined.crossJoin(F.broadcast(tot)).select(
        "bin", "n_base", "n_cur",
        F.round((p - q) * F.log(p / q), round_dp).alias("psi_contrib"))
    total = contrib.agg(
        F.round(F.sum("psi_contrib"), round_dp).alias("psi"))
    return (contrib.crossJoin(F.broadcast(total))
            .select("bin", "n_base", "n_cur", "psi_contrib", "psi"))
