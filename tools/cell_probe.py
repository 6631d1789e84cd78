"""One-off timed cells: run registry queries against an arbitrary sf
dir with the scaling-probe methodology (per-run isolation, big-cell
shuffle confs, single run by default).

Used for the round-12 second-decade points of the contrast-excluded
quadratics (sf2 cells pin the fitted exponent with a third measured
point without burning hours at sf10-projected cost) and any ad-hoc
cell the SCALING.md narrative needs.

Usage: python tools/cell_probe.py <sf_dir> <query> [query ...]
One JSON line per cell on stdout.
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
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    runs = int(os.environ.get("SPARK_GRAFT_CELL_RUNS", "1"))
    spark = get_spark("cell-probe")
    spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
    for name in names:
        fn = REGISTRY[name].fn
        best = float("inf")
        for _ in range(runs):
            clear_session_memos()
            spark.catalog.clearCache()
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        print(json.dumps({"query": name, "sf_dir": sf_dir,
                          "sec": round(best, 3),
                          "loadavg": round(os.getloadavg()[0], 2)}),
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
