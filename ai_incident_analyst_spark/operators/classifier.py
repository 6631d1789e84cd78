"""Distributed logistic-regression quality classifier.

The modern corpus-curation stack scores every document with a cheap
linear classifier (C4's langid filter, GPT-3/LLaMA's "looks like
reference text" LR over hashed features, DCLM's fastText scorer) and
keeps the top quantile. The reference has no trainer at all; this is the
training-pipeline extension, built the same way as
``operators/clustering.py``: the corpus never moves, the model lives on
the driver, and each optimization step is ONE declarative pass.

Physical design — full-batch gradient descent where each iteration is a
pure Catalyst aggregation (zero Python, zero shuffle beyond the final
partial-agg reduce):

- The current weight vector enters the plan as LITERALS, so the
  per-iteration gradient ``Σ xᵢ·(σ(w·xᵢ) − yᵢ)`` is d+1 map-side-combined
  ``sum()`` columns over the cached feature frame — whole-stage codegen'd
  end to end, driver receives exactly one row of d+1 doubles per round.
- Fixed iteration count + zero init + deterministic feature exprs make
  the whole training run reproducible math: an unrolled SQL twin can
  replay it bit-for-bit up to FP association order (the same contract as
  the fixed-centroid IVF/PQ oracles).
- At 100 TB: per-round cost is one corpus scan (or cache hit); the model
  state is d+1 doubles. Rounds are the serial factor, same as k-means.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sigmoid(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def _margin(weights: Sequence[float], xs: Sequence[Column]) -> Column:
    z = F.lit(float(weights[0])) * xs[0]
    for w, x in zip(weights[1:], xs[1:]):
        z = z + F.lit(float(w)) * x
    return z


def lr_train(df: DataFrame, feature_cols: Sequence[str], label_col: str,
             iterations: int = 3, lr: float = 1.0) -> list[float]:
    """Full-batch GD for logistic regression; returns the learned weights
    (one per feature column, in order — include an explicit all-ones
    column for the intercept).

    Deterministic by construction: w₀ = 0, fixed ``iterations``, mean
    gradient. Cache ``df`` before calling if it is derived — every
    iteration scans it once.

    Complete-case, like ``ols_by_group``: rows with a NULL or NaN
    feature/label are dropped before counting — without this, sum()
    skips NULL rows (or NaN poisons the whole gradient) while
    ``n = count()`` still includes them, silently biasing the mean
    gradient on dirty input.
    """
    from .util import complete_case

    xs = [F.col(c).cast("double") for c in feature_cols]
    y = F.col(label_col).cast("double")
    df = complete_case(df, xs + [y])
    n = df.count()
    if n == 0:
        raise ValueError("cannot train on an empty frame")
    w = [0.0] * len(feature_cols)
    for _ in range(iterations):
        err = _sigmoid(_margin(w, xs)) - y
        grads = df.select(
            *[F.sum(err * x).alias(f"g{i}") for i, x in enumerate(xs)]
        ).first()
        w = [wi - lr * grads[f"g{i}"] / n for i, wi in enumerate(w)]
    return w


def lr_score(df: DataFrame, feature_cols: Sequence[str],
             weights: Sequence[float],
             out_col: str = "score") -> DataFrame:
    """Append ``σ(w·x)`` as ``out_col`` — a pure column expression, scan
    speed, usable in a streaming select as-is."""
    if len(weights) != len(feature_cols):
        raise ValueError("weights/features length mismatch")
    xs = [F.col(c).cast("double") for c in feature_cols]
    return df.withColumn(out_col, _sigmoid(_margin(weights, xs)))


def doc_quality_features(text: Column | str) -> dict[str, Column]:
    """The fixed cross-engine feature map used by the registry's trained
    quality classifier. Every feature is bounded O(1) (no standardization
    pass needed) and is expressible identically in ANSI SQL:

    - ``x_len``: characters, capped at 2000, scaled to [0,1]
    - ``x_the``: occurrences of literal ``" the "`` per 100 chars (an
      English-prose marker the fake corpus's langs separate on)
    - ``x_digit``: digit-character fraction
    - ``x_toklen``: mean space-token length / 10
    """
    c = F.col(text) if isinstance(text, str) else text
    n_chars = F.length(c)
    x_len = F.least(n_chars, F.lit(2000)).cast("double") / F.lit(2000.0)
    occ_the = (n_chars - F.length(F.replace(c, F.lit(" the "), F.lit("")))) \
        .cast("double") / F.lit(5.0)
    x_the = occ_the * F.lit(100.0) / (n_chars.cast("double") + F.lit(1.0))
    digits = n_chars - F.length(F.regexp_replace(c, r"[0-9]", ""))
    x_digit = digits.cast("double") / (n_chars.cast("double") + F.lit(1.0))
    n_tok = F.size(F.split(c, " "))
    x_toklen = (n_chars.cast("double")
                / (n_tok.cast("double") + F.lit(1.0))) / F.lit(10.0)
    return {"x_len": x_len, "x_the": x_the,
            "x_digit": x_digit, "x_toklen": x_toklen}


def calibration_report(df: DataFrame, score_col: str, label_col: str,
                       n_bins: int = 10, round_dp: int = 6) -> DataFrame:
    """Reliability diagram + expected calibration error for a
    probabilistic classifier — the deployment check ``lr_score`` needs
    before its scores gate a corpus (a quality filter that says 0.9 but
    is right 60% of the time silently skews the training mixture).

    Returns one row per non-empty score bin:
    ``(bin, n, mean_score, pos_rate, ece)`` — ``bin`` =
    ``min(floor(score·n_bins), n_bins−1)``, ``mean_score`` the average
    predicted probability in the bin, ``pos_rate`` the empirical label
    rate, and ``ece`` the bin-weighted |mean_score − pos_rate| summary
    (Guo et al. 2017), identical on every row (a 1-row broadcast
    anchor, so the frame is self-contained for a dashboard).

    Determinism contract: per-row scores are rounded to ``round_dp``
    BEFORE binning and summation (binning boundaries then cut identical
    values in every engine), bin sums re-round at ``round_dp`` to
    absorb fold-order ulps, and ``pos_rate`` is an exact integer ratio.
    Plan: one map-side-combined groupBy(bin) — a ≤``n_bins``-row
    result — plus the scalar ECE anchor; corpus scanned once.
    """
    s = F.round(F.col(score_col), round_dp)
    y = F.col(label_col).cast("double")
    binned = df.select(
        F.least(F.floor(s * n_bins), F.lit(n_bins - 1))
        .cast("long").alias("bin"),
        s.alias("__s"), y.alias("__y"))
    bins = (binned.groupBy("bin")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("__s"), round_dp).alias("__ssum"),
                 F.sum("__y").cast("long").alias("__pos"))
            .select(
                "bin", "n",
                F.round(F.col("__ssum") / F.col("n"), round_dp)
                .alias("mean_score"),
                F.round(F.col("__pos") / F.col("n"), round_dp)
                .alias("pos_rate")))
    ece = (bins.agg(F.round(
        F.sum(F.col("n") * F.abs(F.col("mean_score") - F.col("pos_rate")))
        / F.sum("n"), round_dp).alias("ece")))
    return bins.crossJoin(F.broadcast(ece)) \
        .select("bin", "n", "mean_score", "pos_rate", "ece")
