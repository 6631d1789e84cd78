"""Curriculum / interleaved training-order assembly.

Training-data ORDER matters: mixture work (GLaM, Chinchilla data
recipes) interleaves domains so every gradient window sees the target
mixture, and curriculum-learning recipes (Bengio et al. 2009) schedule
easy→hard by a difficulty score. The reference has no ordering surface
at all (its batches are whatever the incident API returned —
``src/new_relic_fetcher.py``); these two operators produce a
DETERMINISTIC global training order as data, not as a shuffle
side-effect:

``difficulty_buckets``
    Assign each row a quantile bucket of a difficulty score. Boundaries
    are ONE exact interpolated-percentile aggregate (Spark
    ``percentile`` ≡ DuckDB ``quantile_cont`` — the parity
    ``operators/robust.py`` established), broadcast back as a 1-row
    anchor; the bucket id is then an integer count of exceeded
    boundaries — no ``ntile``, whose global-order window would funnel
    100 TB through one task.

``interleave_order``
    Round-robin interleave over any categorical key (a domain/source,
    or a ``difficulty_buckets`` output): position ``p`` within each key
    by the md5-of-id hash order (reproducible, append-stable for
    surviving rows — the repo sampling contract), so reading in
    ``(p, key)`` order yields blocks that each span every key once.
    ONE keyed shuffle for the per-key window; the global order is a
    SORT KEY THE CONSUMER APPLIES (``orderBy(p, key)`` feeding a
    range-partitioned write), never a single-task window — at scale the
    sort is Spark's range-partitioned exchange, which parallelizes.

Both are pure relational plans — no UDF, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def difficulty_buckets(df: DataFrame, score_col: str,
                       n_buckets: int = 4,
                       out_col: str = "bucket") -> DataFrame:
    """Quantile-bucket ``score_col`` into ``n_buckets`` (0 = easiest).

    Bucket boundaries are the exact interpolated ``i/n_buckets``
    percentiles computed in one tiny aggregate and broadcast; the bucket
    id is the count of boundaries the score strictly exceeds — ties at
    a boundary fall into the LOWER bucket in both engines (integer-exact
    comparison semantics, no rounding rule involved).
    """
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    s = F.col(score_col)
    bounds = df.agg(*[
        F.percentile(s, F.lit(i / n_buckets)).alias(f"__b{i}")
        for i in range(1, n_buckets)])
    bucket = sum(
        (F.when(s > F.col(f"__b{i}"), 1).otherwise(0)
         for i in range(1, n_buckets)),
        F.lit(0))
    return (df.crossJoin(F.broadcast(bounds))
            .withColumn(out_col, bucket.cast("long"))
            .drop(*[f"__b{i}" for i in range(1, n_buckets)]))


def interleave_order(df: DataFrame, id_col: str, key_col: str,
                     out_col: str = "pos") -> DataFrame:
    """Per-key round-robin position: ``out_col`` = 1-based rank of the
    row within its ``key_col`` group under md5-of-id order. Sorting the
    result by ``(out_col, key_col)`` is the interleaved training order;
    the first ``n_keys`` rows cover every key once, the next block
    again, until short keys exhaust."""
    w = (Window.partitionBy(key_col)
         .orderBy(F.md5(F.col(id_col).cast("string")),
                  F.col(id_col).asc()))
    return df.withColumn(out_col, F.row_number().over(w).cast("long"))
