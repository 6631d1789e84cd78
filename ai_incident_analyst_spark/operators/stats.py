"""Closed-form statistics as single aggregation passes: per-group OLS
and the chi-squared independence test.

Both are textbook sufficient-statistics computations — everything
reduces to sums the engine combines map-side, so each fits in ONE
groupBy over the data (plus a tiny contingency-table reshape for
chi-squared). Deterministic arithmetic over exact counts/sums → both
hash-match SQL twins (the Theil–Sen/percentile family's contract,
without even the interpolation subtlety).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ols_by_group(df: DataFrame, key: str, x_col: str,
                 y_col: str) -> DataFrame:
    """Per-group simple linear regression from sufficient statistics:
    ``(key, n, slope, intercept, r2)``.

    slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²); r² from the same sums.
    Groups with zero x-variance return NULL slope/intercept/r2 (a
    vertical fit is undefined — surfacing NULL beats silently emitting
    0). One aggregation pass; outputs rounded 6 dp.
    """
    from .util import complete_case

    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    # complete-case analysis: a row missing either coordinate must not
    # inflate n while being skipped by the sums (silently wrong fits)
    df = complete_case(df, [x, y])
    agg = df.groupBy(key).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"), F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"), F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    n = F.col("n").cast("double")
    cov_n = n * F.col("sxy") - F.col("sx") * F.col("sy")
    varx_n = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vary_n = n * F.col("syy") - F.col("sy") * F.col("sy")
    slope = F.when(varx_n > 0, cov_n / varx_n)
    intercept = F.when(varx_n > 0,
                       (F.col("sy") - slope * F.col("sx")) / n)
    r2 = F.when((varx_n > 0) & (vary_n > 0),
                (cov_n * cov_n) / (varx_n * vary_n))
    return agg.select(
        key, "n",
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    )


def chi_squared(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Pearson chi-squared test of independence between two categorical
    columns: one row ``(chi2, dof, n)``.

    Observed counts come from one groupBy over (a, b); expected counts
    from the two marginal tables joined back (both category-cardinality,
    broadcast). ``chi2 = Σ (O − E)² / E`` over observed cells PLUS the
    ``E`` mass of structurally-zero cells — handled in closed form as
    ``n − Σ_observed E`` so absent combinations need no dense
    cross-join materialization. dof = (|A|−1)(|B|−1).
    """
    # complete-case analysis, like ols_by_group: without this, rows with
    # a NULL category would stay in n (inflating the zero-cell mass
    # term) while the inner joins on a/b never match NULL keys, so their
    # (O−E)²/E contribution silently dropped and dof excluded the NULL
    # class — statistically wrong on dirty input. Treating NULL as "no
    # observation of this variable" and dropping the row is the standard
    # contingency-table convention; callers who mean "missing" as a real
    # class should fillna a sentinel category first.
    df = df.filter(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
    obs = (
        df.groupBy(F.col(col_a).alias("a"), F.col(col_b).alias("b"))
        .agg(F.count("*").alias("o"))
        .localCheckpoint(eager=False)
    )
    ma = obs.groupBy("a").agg(F.sum("o").alias("na"))
    mb = obs.groupBy("b").agg(F.sum("o").alias("nb"))
    n = obs.agg(F.sum("o").alias("n"))
    cells = (
        obs.join(ma, "a").join(mb, "b").join(n)
        .withColumn("e", F.col("na") * F.col("nb")
                    / F.col("n").cast("double"))
    )
    stat = cells.agg(
        # Σ over observed cells of (O−E)²/E, plus the zero-cell mass:
        # Σ_all E = n, so Σ_zero (0−E)²/E = Σ_zero E = n − Σ_obs E
        (F.sum((F.col("o") - F.col("e")) ** 2 / F.col("e"))
         + F.max("n") - F.sum("e")).alias("chi2"),
        F.count_distinct("a").alias("ka"),
        F.count_distinct("b").alias("kb"),
        F.max("n").alias("n"),
    )
    return stat.select(
        F.round("chi2", 6).alias("chi2"),
        ((F.col("ka") - 1) * (F.col("kb") - 1)).cast("long").alias("dof"),
        "n",
    )
