"""Time-bucketed rollups (continuous aggregates): materialize additive
partial aggregates per (bucket, dims), maintain them incrementally as new
data lands, and answer coarser aggregate queries from the rollup instead
of the raw table.

The reference's dashboard re-aggregates the raw history on every request
(``app.py:15-44``); at 100 TB that query must hit a rollup. This module is
the TimescaleDB-continuous-aggregate / druid-rollup pattern expressed as
plain DataFrames:

* partials are ADDITIVE (count, decimal sum, min, max) so any union of
  rollups merges with one more aggregation — no raw-data reread;
* the rollup is keyed by (bucket, dims): appending a late batch only
  touches the buckets the batch contains (merge is a keyed groupBy that
  AQE prunes to the affected partitions);
* sums accumulate in DECIMAL(27,4) — partition-merge-order independent,
  so rollup-derived answers hash-match raw-table answers exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: partial columns produced per value column
_PARTIALS = ("cnt", "sum", "min", "max")


def build_rollup(df: DataFrame, ts_col: str, dims: list[str],
                 value_col: str, bucket: str = "day") -> DataFrame:
    """One rollup row per (bucket_start, *dims) with additive partials
    ``(n_rows, {v}_cnt, {v}_sum, {v}_min, {v}_max)``. Single keyed
    shuffle with map-side combine — the same cost as the coarsest query
    it will ever answer.
    """
    v = F.col(value_col)
    return (
        df.groupBy(F.date_trunc(bucket, F.col(ts_col)).alias("bucket_start"),
                   *[F.col(d) for d in dims])
        .agg(
            F.count("*").alias("n_rows"),
            F.count(v).alias(f"{value_col}_cnt"),
            F.sum(v.cast("decimal(27,4)")).alias(f"{value_col}_sum"),
            F.min(v).alias(f"{value_col}_min"),
            F.max(v).alias(f"{value_col}_max"),
        )
    )


def merge_rollups(a: DataFrame, b: DataFrame, value_col: str) -> DataFrame:
    """Combine two rollups over the same schema (e.g. the stored rollup
    plus a fresh batch's rollup): union + one keyed re-aggregation of the
    additive partials. Only buckets present in ``b`` change value, and
    the groupBy shuffle carries rollup rows (buckets x dims), never raw
    data — this is the incremental-maintenance step.
    """
    keys = [c for c in a.columns
            if c != "n_rows" and not c.startswith(f"{value_col}_")]
    u = a.unionByName(b)
    return (
        u.groupBy(*keys)
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.sum(f"{value_col}_cnt").alias(f"{value_col}_cnt"),
            F.sum(f"{value_col}_sum").alias(f"{value_col}_sum"),
            F.min(f"{value_col}_min").alias(f"{value_col}_min"),
            F.max(f"{value_col}_max").alias(f"{value_col}_max"),
        )
    )


def query_rollup(rollup: DataFrame, group_by: list[str],
                 value_col: str) -> DataFrame:
    """Answer an aggregate query at any coarser grouping from the rollup
    alone (rollup algebra: counts and sums add; min/max nest; avg =
    exact decimal sum / count, divided ONCE in double). Output per group:
    ``(n_rows, n_values, total, vmin, vmax, vavg)``.
    """
    return (
        rollup.groupBy(*[F.col(c) for c in group_by])
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.sum(f"{value_col}_cnt").alias("n_values"),
            F.sum(f"{value_col}_sum").cast("double").alias("total"),
            F.min(f"{value_col}_min").alias("vmin"),
            F.max(f"{value_col}_max").alias("vmax"),
        )
        .withColumn("vavg", F.col("total") / F.col("n_values"))
    )
