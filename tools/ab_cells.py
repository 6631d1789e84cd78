"""Same-JVM A/B cells: run each registry query against TWO sf dirs,
interleaved (A,B,A,B per query), in ONE Spark session — the only
cross-corpus comparison the measurement-hygiene rules allow on this VM
(loadavg swings 8-22 with idle CPU across JVMs; within-session
adjacent cells share the epoch).

Round-13 use: isotropic vs clustered embeddings twin for the vector
family — the probe runs answered the decade-law question per corpus,
this answers "is the clustered regime SLOWER than the isotropic one
the old cells rode?" without epoch contamination.

Usage: python tools/ab_cells.py <dirA> <dirB> <query> [query ...]
One JSON line per (query, dir) cell on stdout, interleaved run order.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

from ai_incident_analyst_spark.queries import REGISTRY, clear_session_memos
from ai_incident_analyst_spark.session import get_spark


def main() -> None:
    dir_a, dir_b = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    spark = get_spark("ab-cells")
    spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
    for name in names:
        for d in (dir_a, dir_b):
            clear_session_memos()
            spark.catalog.clearCache()
            t0 = time.time()
            REGISTRY[name].fn(spark, d).write.format("noop") \
                .mode("overwrite").save()
            print(json.dumps({"query": name, "sf_dir": d,
                              "sec": round(time.time() - t0, 3),
                              "loadavg": round(os.getloadavg()[0], 2)}),
                  flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
