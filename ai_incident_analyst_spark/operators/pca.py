"""Distributed PCA over an embedding column.

Dimensionality reduction is the standard pre-ANN compression step (PCA
to 32–128 dims before IVF/PQ is the FAISS-recommended recipe) and a
corpus-analysis tool in its own right (embedding-drift dashboards). The
reference's vector side is a flat index with no transforms
(``src/vector_db/faiss_db.py``); this is the training-pipeline
extension, built on the same driver-model/corpus-stays-put contract as
``operators/clustering.py`` k-means and ``operators/classifier.py`` LR.

Physical design — covariance accumulation, the one-pass exact method:

- ONE Arrow pass over the corpus: each partition emits the partial
  sufficient statistics ``(count, Σx, Σxxᵀ)`` — a single row of
  1 + d + d² doubles (d=64 → ~33 KB). Map-side combine by construction;
  driver traffic is #partitions rows regardless of corpus size.
- The driver folds partials, forms ``cov = Σxxᵀ/n − μμᵀ``, and runs a
  d×d symmetric eigendecomposition (numpy ``eigh`` — microseconds at
  embedding dims). Component signs are fixed deterministically (largest-
  magnitude coefficient positive), the np.linalg convention-independent
  rule.
- Projection is one more Arrow pass with the (k, d) component matrix
  broadcast — embarrassingly parallel, no shuffle.

The covariance itself is deterministic relational math, so it is
oracle-checked cell-by-cell against a SQL twin; the eigendecomposition
is iterative-FP and carries a numpy-parity test instead (the same split
as k-means: assignment oracle-able, training pytest-verified).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .util import spread


def covariance_stats(df: DataFrame, vec_col: str):
    """One-pass sufficient statistics: ``(n, mean (d,), cov (d, d))``.

    Population covariance (divide by n) — matches the SQL identity
    ``avg(x_i·x_j) − avg(x_i)·avg(x_j)`` an oracle can state directly.
    """
    schema = "n long, s1 array<double>, s2 array<double>"

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s1 = None
        s2 = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array(list(pdf[vec_col]), dtype=np.float64)
            n += len(x)
            c1 = x.sum(axis=0)
            c2 = x.T @ x
            s1 = c1 if s1 is None else s1 + c1
            s2 = c2 if s2 is None else s2 + c2
        if n:
            yield pd.DataFrame({"n": [n], "s1": [s1],
                                "s2": [s2.ravel()]})

    parts = (
        df.select(F.col(vec_col).cast("array<double>").alias(vec_col))
        .mapInPandas(partial, schema=schema)
        .collect()
    )  # one row per non-empty partition — bounded by cluster size
    if not parts:
        raise ValueError("covariance_stats on an empty frame")
    n = sum(r["n"] for r in parts)
    s1 = np.sum([np.array(r["s1"]) for r in parts], axis=0)
    s2 = np.sum([np.array(r["s2"]) for r in parts], axis=0)
    d = len(s1)
    mean = s1 / n
    cov = s2.reshape(d, d) / n - np.outer(mean, mean)
    return n, mean, cov


def pca_fit(df: DataFrame, vec_col: str, k: int):
    """Fit top-``k`` principal components; returns ``(mean (d,),
    components (k, d), explained_var (k,))`` with deterministic signs."""
    _, mean, cov = covariance_stats(df, vec_col)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T  # (k, d)
    # sign fix: largest-|coef| coordinate made positive (ties: first)
    for i in range(len(comps)):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, vals[order]


def pca_power_fit(df: DataFrame, vec_col: str, iters: int = 2):
    """Fixed-rounds power iteration for the TOP principal direction:
    ``v ← normalize(cov @ v)`` from the all-ones start, ``iters`` times.

    The ``eigh``-based ``pca_fit`` is the production fit (exact, all
    components) but iterative-FP inside LAPACK — no SQL twin. This
    variant is the oracle-checkable fit (the ``kmeans_clusters`` /
    ``quality_lr_train`` unrolled-twin pattern): every step is plain
    matrix arithmetic a SQL oracle replays term-for-term, and with a
    real spectral gap two rounds already align with the dominant
    eigenvector (parity + alignment in tests/test_pca.py). Returns
    ``(mean (d,), v (d,))``.
    """
    _, mean, cov = covariance_stats(df, vec_col)
    v = np.ones(cov.shape[0], dtype=np.float64)
    for _ in range(iters):
        v = cov @ v
        v = v / np.linalg.norm(v)
    return mean, v


def pca_deflate_fit(df: DataFrame, vec_col: str, k: int,
                    iters: int = 2):
    """Top-``k`` principal directions by fixed-rounds power iteration
    WITH HOTELLING DEFLATION — the fully oracle-checkable fit: every
    step (matvec, normalize, Rayleigh quotient, rank-1 deflation) is
    plain matrix arithmetic a SQL twin replays term-for-term, extending
    ``pca_power_fit`` (top-1 only) to a whole component block.

    Per component: ``v ← normalize(cov_c @ v)`` from the all-ones start
    (``iters`` rounds, deterministic sign by construction — no LAPACK
    convention to pin), then ``λ = vᵀ·cov_c·v`` and
    ``cov_{c+1} = cov_c − λ·v·vᵀ``. Fixed rounds rather than a
    convergence test keep the twin finite; with real spectral gaps two
    rounds align well (tests assert alignment vs ``eigh``). The
    ``eigh``-based ``pca_fit`` stays the production fit (exact, no
    iteration error); this is the auditable sibling. Returns
    ``(mean (d,), components (k, d))``.
    """
    if k < 1 or iters < 1:
        raise ValueError("k and iters must be >= 1")
    _, mean, cov = covariance_stats(df, vec_col)
    cov = cov.copy()
    comps = []
    for _ in range(k):
        v = np.ones(cov.shape[0], dtype=np.float64)
        for _ in range(iters):
            v = cov @ v
            v = v / np.linalg.norm(v)
        lam = float(v @ cov @ v)
        comps.append(v)
        cov = cov - lam * np.outer(v, v)
    return mean, np.stack(comps)


def pca_project(df: DataFrame, id_col: str, vec_col: str,
                mean, components, out_col: str = "pc") -> DataFrame:
    """Append the (k,) projection ``components @ (x − mean)`` as
    ``out_col`` — one broadcast + one Arrow pass, no shuffle."""
    sc = df.sparkSession.sparkContext
    bb = sc.broadcast((np.asarray(mean, dtype=np.float64),
                       np.asarray(components, dtype=np.float64)))
    schema = f"{id_col} long, {out_col} array<double>"

    def proj(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mu, comps = bb.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array(list(pdf[vec_col]), dtype=np.float64)
            p = (x - mu) @ comps.T
            yield pd.DataFrame({id_col: pdf[id_col], out_col: list(p)})

    return (
        spread(df.select(id_col, F.col(vec_col).cast("array<double>")
                         .alias(vec_col)), id_col)
        .mapInPandas(proj, schema=schema)
    )
