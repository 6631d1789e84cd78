"""Count-min sketch as a relational, cross-engine-reproducible structure.

A CMS answers "how often does key x occur?" within ε·N overcount using
d×w counters — the streaming/heavy-hitter sketch every large pipeline
keeps per window. Two design points make this one Spark-idiomatic and
oracle-checkable:

* **The sketch IS a DataFrame** ``(row, col, cnt)`` (d·w rows max), built
  with one explode + one groupBy — map-side combinable, mergeable across
  windows/partitions by construction (sum matching cells), no UDAF, no
  driver state.
* **Hash rows derive from md5**, which is bit-identical in Spark and
  DuckDB (unlike xxhash64) — so estimates, not just exact answers, are
  value-hash-verifiable against the oracle. h_i(key) = first 8 hex chars
  of md5(i || key) mod w.

At 100 TB the build is a scan + one shuffle of at most d·w·partitions
partial rows; estimation for a probe set is a broadcast join of the tiny
sketch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cms_col(key: Column, i: int, width: int) -> Column:
    """Row-i bucket of ``key``: md5 hex prefix as int, mod width."""
    h = F.md5(F.concat(F.lit(str(i)), F.lit("|"), key.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width)


def cms_build(df: DataFrame, key_col: str, depth: int = 4,
              width: int = 1024) -> DataFrame:
    """Build the sketch: ``(row, col, cnt)`` with one explode + groupBy."""
    key = F.col(key_col)
    cells = F.array(*[
        F.struct(F.lit(i).alias("row"), _cms_col(key, i, width).alias("col"))
        for i in range(depth)
    ])
    return (
        df.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.col").alias("col"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Sketches over disjoint data unions by summing matching cells —
    the property that lets per-window/per-partition sketches roll up."""
    return (
        a.unionByName(b)
        .groupBy("row", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(sketch: DataFrame, probes: DataFrame, key_col: str,
                 depth: int = 4, width: int = 1024) -> DataFrame:
    """Point-estimate each probe key: min over its d cells (missing cell
    = 0). The sketch side is tiny (≤ d·w rows) and broadcast; the probe
    set is never shuffled."""
    key = F.col(key_col)
    cells = F.array(*[
        F.struct(F.lit(i).alias("row"), _cms_col(key, i, width).alias("col"))
        for i in range(depth)
    ])
    exploded = probes.select(key.alias(key_col), F.explode(cells).alias("c")) \
        .select(key_col, F.col("c.row").alias("row"), F.col("c.col").alias("col"))
    return (
        exploded.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
    )
