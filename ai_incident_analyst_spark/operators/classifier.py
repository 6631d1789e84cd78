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
