"""Hot-key skew probe — the SURVEY §4 scenario measured.

SURVEY §4 calls for "salted repartition if one container_name
dominates". The registry oracles `salted_agg` / `salted_join` /
`key_skew_report` on the UNIFORM testdata twins (correctness), but no
measurement existed of what the salting actually buys on a hot key.
This probe builds a deliberately skewed frame — one container_name at
30% of the mass, the rest uniform — and times:

  agg   : plain groupBy sum/count/min/max  vs  salted_agg
  join  : fact⋈dim sort-merge join with (a) AQE skew-split OFF,
          (b) AQE skew-split ON, (c) salted_join (AQE skew OFF)
          — broadcast disabled so the join actually shuffles; a
          20k-row dim would otherwise broadcast and hide the skew.

Expected physics, stated up front so the numbers confirm or refute:
- ALGEBRAIC aggs are skew-immune: partial aggregation combines the hot
  key map-side, so every task ships one partial row per key — salting
  can only add a shuffle. If plain ≈ salted here, that is the correct
  outcome and the registry docs should (and do) say "salt aggs only
  when partials can't combine".
- JOINS are where the hot key hurts: SMJ hashes the fact by key, so the
  hot key's 30% lands in ONE sort task. AQE skew-split and salting are
  the two fixes; this probe measures both against the broken baseline.

Usage: python tools/skew_probe.py [n_rows]   (default 20_000_000)
Prints a markdown table to stdout for SCALING.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ai_incident_analyst_spark.operators.skew import salted_agg, salted_join
from ai_incident_analyst_spark.session import get_spark

HOT_SHARE = 0.30
N_COLD_KEYS = 20_000


def build_frames(spark, n_rows: int):
    """Skewed fact: key 'hot-container' for 30% of rows (by id hash so
    the skew is layout-independent), else uniform over 20k keys; a
    payload column gives the rows realistic width. Dim: one row per
    key. Both materialized (localCheckpoint) so timing excludes gen."""
    base = spark.range(n_rows)
    bucket = F.abs(F.xxhash64("id"))
    fact = base.select(
        F.when((bucket % 100) < int(HOT_SHARE * 100), F.lit("hot-container"))
        .otherwise(F.concat(F.lit("c-"),
                            ((bucket / 100) % N_COLD_KEYS).cast("long")))
        .alias("container_name"),
        (F.col("id") % 997).cast("double").alias("v"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    ).localCheckpoint()
    dim = spark.range(N_COLD_KEYS + 1).select(
        F.when(F.col("id") == 0, F.lit("hot-container"))
        .otherwise(F.concat(F.lit("c-"), (F.col("id") - 1)))
        .alias("container_name"),
        (F.col("id") % 7).alias("tier"),
    ).localCheckpoint()
    return fact, dim


def timed(label: str, df, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    print(f"# {label}: {best:.2f}s", file=sys.stderr)
    return round(best, 2)


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    # the localCheckpointed fact frame lives on-heap (~90 B/row); the
    # 8g default dies at 60M rows — same sizing as tools/scaling_probe
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark(app_name="skew-probe")
    # force the join to SHUFFLE: a 20k-row dim would broadcast and hide
    # the skew entirely (which is itself the first-choice fix — the
    # probe measures the no-broadcast regime a 100 TB dim forces)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    fact, dim = build_frames(spark, n_rows)
    fact.count(), dim.count()   # materialize checkpoints

    aggs = {"total_v": ("v", "sum"), "n": ("v", "count"),
            "vmin": ("v", "min"), "vmax": ("v", "max")}
    results: list[tuple[str, float]] = []

    plain_agg = fact.groupBy("container_name").agg(
        F.sum("v").alias("total_v"), F.count("v").alias("n"),
        F.min("v").alias("vmin"), F.max("v").alias("vmax"))
    results.append(("agg plain groupBy (partial-agg combine)",
                    timed("agg_plain", plain_agg)))
    results.append(("agg salted_agg (2-phase, 16 salts)",
                    timed("agg_salted", salted_agg(fact, "container_name",
                                                   aggs))))

    joined_cols = lambda df: df.select(  # noqa: E731
        F.count("*").alias("n"), F.sum("tier").alias("s"))

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    results.append(("join SMJ, AQE skew-split OFF (hot key in 1 task)",
                    timed("join_noaqe",
                          joined_cols(fact.join(dim, "container_name")))))
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    results.append(("join SMJ, AQE skew-split ON",
                    timed("join_aqe",
                          joined_cols(fact.join(dim, "container_name")))))
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    results.append(("join salted_join (8 salts, AQE skew OFF)",
                    timed("join_salted",
                          joined_cols(salted_join(fact, dim,
                                                  "container_name")))))
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    print(f"\nn_rows={n_rows:,}, hot key share={HOT_SHARE:.0%}, "
          f"{N_COLD_KEYS:,} cold keys, broadcast disabled\n")
    print("| scenario | best-of-2 wall |")
    print("|---|---|")
    for label, sec in results:
        print(f"| {label} | {sec} s |")


if __name__ == "__main__":
    main()
