"""Distributed EXACT interpolated percentiles with bounded memory.

Spark's built-in ``percentile`` aggregate is exact but buffers the whole
value multiset in the aggregation state (an OpenHashMap value->count per
partition, merged single-threaded at the end). On a mostly-distinct
numeric column that is O(N) heap: the round-10 sf10 probe measured
``psi_orderprice_drift`` — two exact 9-point percentile aggregates over
~45M near-distinct doubles — at 229 s warm, with the growth curve of a
memory-bound merge (7.5x then 17.6x per 10x data). DuckDB's sort-based
``quantile_cont`` has no such cliff, so the twin was never the problem;
the Spark physical strategy was.

``exact_percentiles`` computes the same interpolated order statistics
with bounded memory via iterative bucket refinement — the classic
distributed-selection recipe:

1. one aggregate for (count, min, max) of the non-null values;
2. map each target percentile p to the order-statistic ranks
   floor(p*(N-1)) and floor(p*(N-1))+1;
3. bucket-count pass: equal-width bucket index over ``coarse_bins``
   buckets (map-side combined, <= coarse_bins rows out, each row also
   carrying the bucket's min/max value); a driver-side cumulative walk
   locates the bucket holding each needed rank;
4. a located bucket holding more than ``cap`` rows (skew) is refined
   with another bucket-count pass over just its rows, re-ranged to the
   bucket's MEASURED [min, max] — depth is logarithmic (each pass
   shrinks a bucket ~coarse_bins-fold) and progress is guaranteed: a
   heavy bucket whose min == max is all ties and every rank inside it
   resolves to that value directly with no further pass, and a heavy
   bucket too ulp-dense to subdivide (sub-width underflows to 0)
   resolves exactly from a value->count aggregate instead of refining;
5. the final pass collects only the located buckets' values (<= cap
   each), sorts them driver-side, and reads the exact order statistics
   via the buckets' cumulative start ranks.

Every scan is a codegen'd filter+groupBy; driver memory is bounded by
``cap`` (default 2M doubles = 16 MB) + ``coarse_bins`` counts. The
result is bit-identical to ``F.percentile`` / DuckDB ``quantile_cont``
(same v[k]*(1-frac) + v[k+1]*frac interpolation in float64), which the
tests assert against the built-in on every distribution shape.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["exact_kth_smallest", "exact_percentiles"]


def _bidx(col: str, lo: float, w: float, nb: int) -> Column:
    """Equal-width bucket index in [0, nb) — the ONE expression used by
    both the counting pass and bucket membership, so the two can never
    disagree on boundary float arithmetic."""
    # clamp in DOUBLE before floor/cast: (x - lo) can overflow to +inf
    # when the column spans most of the double range, and inf must land
    # in the top bucket rather than poison the long cast
    raw = (F.col(col) - F.lit(lo)) / F.lit(w)
    clamped = F.greatest(F.least(raw, F.lit(float(nb - 1))), F.lit(0.0))
    return F.floor(clamped).cast("long")


def exact_percentiles(df: DataFrame, value_col: str,
                      probs: list[float], coarse_bins: int = 4096,
                      cap: int = 2_000_000) -> list[float | None]:
    """Exact interpolated percentiles of ``value_col`` (NULL/NaN rows
    ignored), equal to ``F.percentile(col, p)`` for each p in
    ``probs`` — computed with bounded memory (see module docstring).

    Returns one float per prob; all-None when the column is empty.
    """
    v = F.col(value_col).cast("double")
    base = (df.select(v.alias(value_col))
            .where(v.isNotNull() & ~F.isnan(v)))
    st = base.agg(F.count("*").alias("n"), F.min(value_col).alias("lo"),
                  F.max(value_col).alias("hi")).first()
    n = st["n"]
    if n == 0:
        return [None] * len(probs)
    lo, hi = float(st["lo"]), float(st["hi"])
    # needed order-statistic ranks (0-based) + interpolation weights
    wants: dict[int, tuple[int, float]] = {}
    ranks: set[int] = set()
    for i, p in enumerate(probs):
        r = p * (n - 1)
        k = int(math.floor(r))
        frac = r - k
        wants[i] = (k, frac)
        ranks.add(k)
        if frac > 0:
            ranks.add(k + 1)
    if lo == hi:
        return [lo] * len(probs)
    rank_to_val = _resolve_ranks(base, value_col, sorted(ranks), lo, hi,
                                 coarse_bins, cap)
    out: list[float | None] = []
    for i in range(len(probs)):
        k, frac = wants[i]
        vk = rank_to_val[k]
        out.append(vk if frac == 0
                   else vk * (1 - frac) + rank_to_val[k + 1] * frac)
    return out


def exact_kth_smallest(df: DataFrame, value_col: str, k: int,
                       coarse_bins: int = 4096,
                       cap: int = 2_000_000) -> float | None:
    """The k-th smallest (1-based) non-null, non-NaN value of
    ``value_col`` — the exact order statistic, via the same
    bounded-memory distributed selection as ``exact_percentiles``.

    This is the drop-in for "rank the column and take row k" plans
    (range-repartition + window + checkpoint): 2-3 codegen'd
    filter+groupBy passes, no sort, no materialized frame, driver
    memory bounded by ``cap``. The k-th smallest VALUE is independent
    of any tie-breaking rule, so it matches any SQL twin's
    ``ORDER BY v, <tiebreak> LIMIT 1 OFFSET k-1``. Returns None when
    the column is empty; raises if k is out of range.
    """
    v = F.col(value_col).cast("double")
    base = (df.select(v.alias(value_col))
            .where(v.isNotNull() & ~F.isnan(v)))
    st = base.agg(F.count("*").alias("n"), F.min(value_col).alias("lo"),
                  F.max(value_col).alias("hi")).first()
    n = st["n"]
    if n == 0:
        return None
    if not (1 <= k <= n):
        raise ValueError(f"k={k} out of range for {n} rows")
    lo, hi = float(st["lo"]), float(st["hi"])
    if lo == hi:
        return lo
    return _resolve_ranks(base, value_col, [k - 1], lo, hi,
                          coarse_bins, cap)[k - 1]


def _resolve_ranks(base: DataFrame, value_col: str, need: list[int],
                   lo: float, hi: float, coarse_bins: int,
                   cap: int) -> dict[int, float]:
    """Resolve 0-based order-statistic ranks to exact values via
    iterative bucket refinement (module docstring steps 3-5)."""
    rank_to_val: dict[int, float] = {}

    # w as hi/nb - lo/nb, never (hi-lo)/nb: the latter overflows to inf
    # when the column spans most of the double range, and an infinite
    # width maps everything to bucket 0 forever.
    def _width(a: float, b: float) -> float:
        return b / coarse_bins - a / coarse_bins

    # work items: (range_lo, width, start_rank, membership_expr | None)
    pending = [(lo, _width(lo, hi), 0, None)]
    located: list[tuple[Column, int, int]] = []
    passes = 0
    while pending:
        passes += 1
        if passes > 64:   # each pass shrinks a bucket ~4096x
            raise RuntimeError("exact_percentiles failed to converge")
        rlo, w, srank, member = pending.pop()
        sub = base if member is None else base.where(member)
        bx = _bidx(value_col, rlo, w, coarse_bins)
        stats = {r["__b"]: (r["__c"], float(r["__lo"]), float(r["__hi"]))
                 for r in
                 (sub.select(bx.alias("__b"), F.col(value_col))
                  .groupBy("__b")
                  .agg(F.count("*").alias("__c"),
                       F.min(value_col).alias("__lo"),
                       F.max(value_col).alias("__hi")).collect())}
        run = srank
        for bi in range(coarse_bins):
            c, blo, bhi = stats.get(bi, (0, 0.0, 0.0))
            if c and any(run <= r < run + c for r in need):
                bexpr = bx == F.lit(bi)
                if member is not None:
                    bexpr = member & bexpr
                if c <= cap:
                    located.append((bexpr, run, c))
                elif blo == bhi:
                    # heavy ties: every rank in the bucket IS this value
                    for r in need:
                        if run <= r < run + c:
                            rank_to_val[r] = blo
                else:
                    sw = _width(blo, bhi)
                    if sw > 0 and math.isfinite(sw):
                        pending.append((blo, sw, run, bexpr))
                    else:
                        # ulp-dense heavy bucket: can't subdivide the
                        # range, but the distinct-value set is tiny
                        # (few representable doubles between blo/bhi)
                        # — resolve ranks from value->count directly.
                        vcs = sorted(
                            (float(r["__v"]), r["__c"]) for r in
                            (sub.where(bexpr)
                             .groupBy(F.col(value_col).alias("__v"))
                             .agg(F.count("*").alias("__c")).collect()))
                        vrun = run
                        for val, vc in vcs:
                            for r in need:
                                if vrun <= r < vrun + vc:
                                    rank_to_val[r] = val
                            vrun += vc
                        assert vrun == run + c, "bucket membership drifted"
            run += c

    # final selection: pull only the located buckets' values
    for bexpr, brank, bcount in located:
        got = sorted(r[0] for r in
                     base.where(bexpr).select(value_col).collect())
        assert len(got) == bcount, "bucket membership drifted"
        for r in need:
            if brank <= r < brank + bcount:
                rank_to_val[r] = float(got[r - brank])
    return rank_to_val
