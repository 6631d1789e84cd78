"""Operator-level physical helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, *key_cols: str) -> DataFrame:
    """Ensure enough partitions for CPU-bound per-row work.

    Small-file local inputs (testdata is one parquet file = one split)
    would otherwise run explode/hash/UDF stages single-threaded. Only
    repartitions when the input has fewer partitions than the session's
    default parallelism — on a real cluster reading many splits this is a
    no-op, so no extra 100 TB shuffle is introduced.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target, *key_cols) if key_cols else df.repartition(target)
    return df
