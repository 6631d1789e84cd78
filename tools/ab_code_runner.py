"""One timed cell per query for CODE-version A/B (r13 optimization).

The caller (tools/ab_code.sh loop or a hand loop) alternates fresh
processes between two checkouts of the engine — $SPARK_GRAFT_REPO_ROOT
selects which code both the driver AND the python workers import (it
is prepended to sys.path here and must also be on PYTHONPATH so
executor-side workers resolve the same version). Same session confs,
warmup and per-cell isolation as bench.py, so a cell here is
comparable to a bench cell; epoch noise cancels by interleaving
A,B,A,B within minutes.

Usage: SPARK_GRAFT_REPO_ROOT=<root> python ab_code_runner.py <tag> <query>...
Prints one JSON line per query: {"tag", "query", "sec", "loadavg"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

root = os.environ["SPARK_GRAFT_REPO_ROOT"]
sys.path.insert(0, root)

from ai_incident_analyst_spark.queries import (  # noqa: E402
    REGISTRY,
    clear_session_memos,
)
from ai_incident_analyst_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"ab-code-{tag}")
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, schema="id long").write.format("noop") \
        .mode("overwrite").save()
    runs = int(os.environ.get("SPARK_GRAFT_AB_RUNS", "3"))
    for name in names:
        best, all_runs = float("inf"), []
        for _ in range(runs):
            clear_session_memos()
            spark.catalog.clearCache()
            t0 = time.time()
            REGISTRY[name].fn(spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            all_runs.append(dt)
            best = min(best, dt)
        print(json.dumps({"tag": tag, "query": name, "sec": best,
                          "runs": all_runs,
                          "loadavg": round(os.getloadavg()[0], 2)}),
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
