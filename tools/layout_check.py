"""Partition-layout robustness gate for FP-iterative oracled queries.

The r5 driver gate caught a failure class the local oracle check
structurally cannot: `kmeans_clusters` hash-matched DuckDB in THIS
environment at every SF, yet diverged in the driver's container.
(Postscript, r7: that particular red turned out to be a result-DTYPE
artifact — DuckDB sum(BIGINT) returns HUGEINT, which the driver's
pandas-based comparer renders as float64 ('124750.0' vs Spark's int64
'124750') — not FP association; check_oracles.py now flags
pandas-unportable oracle dtypes directly. This tool remains the gate for
the REAL layout-sensitivity class it was built for: unrounded float64
partial folds are FP-association-sensitive, so a different partition
layout / core count / BLAS build can shift an iterative result by ulps
and, after a round or two, flip a discrete assignment.)

This tool makes that failure catchable locally: it runs each named query
in SEPARATE subprocesses under genuinely different physical layouts —
different `local[N]` core counts (which changes `defaultParallelism`, and
with it every `spread()` repartition width and the number of per-partition
partials any driver-side fold sees) and different
`spark.sql.shuffle.partitions` — and asserts the normalized output is
byte-identical across layouts.

Usage:
    python tools/layout_check.py [sf_dir] [name ...]

Default query list = every oracled query whose result flows through a
float fold that iterates (k-means, LR/PCA/PageRank/Theil-Sen rounds,
PQ/IVF trained paths). Exit 1 on any layout-sensitive result.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (cpus for local[N]  → defaultParallelism → spread() width & fold count,
#  spark.sql.shuffle.partitions → every groupBy/join/window layout)
LAYOUTS = [(32, 32), (5, 7)]

# FP-iterative / fold-sensitive oracled queries (VERDICT r5 next-#2 list,
# plus the trained-path twins added in r6).
DEFAULT_QUERIES = [
    "kmeans_clusters",
    "kmeans_centroids",
    "kmeans_clusters_int",
    "knn_ivf_kmeans",
    "quality_lr_train",
    "pca_power_project",
    "pagerank_items",
    "theil_sen_daily_trend",
    "knn_ivfpq_fixed",
    "knn_ivfpq",
    "knn_lsh_cosine",
]

_RUNNER = r"""
import hashlib, json, math, sys
sys.path.insert(0, {repo!r})
from ai_incident_analyst_spark.queries import REGISTRY
from ai_incident_analyst_spark.session import get_spark

def norm_cell(v):
    if v is None:
        return "␀"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{{v:.9g}}"
    if hasattr(v, "isoformat"):
        return v.isoformat()[:26]
    if isinstance(v, (list, tuple)):
        # recurse: floats nested in array cells must get the same .9g
        # normalization as scalars or benign ulps false-fail the gate
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{{" + ",".join(
            f"{{k}}:{{norm_cell(v[k])}}" for k in sorted(v)) + "}}"
    if hasattr(v, "asDict"):  # Row nested in a struct cell
        return norm_cell(v.asDict())
    return str(v)

spark = get_spark(cpus={cpus}, shuffle_partitions={sp})
out = {{}}
for name in {names!r}:
    try:
        df = REGISTRY[name].fn(spark, {sf_dir!r})
        cols = df.columns
        idx = sorted(range(len(cols)), key=lambda i: cols[i])
        rows = sorted(tuple(norm_cell(r[i]) for i in idx)
                      for r in df.collect())
        h = hashlib.md5(repr(rows).encode()).hexdigest()
        out[name] = {{"hash": h, "rows": len(rows)}}
    except Exception as e:
        out[name] = {{"error": f"{{type(e).__name__}}: {{e}}"[:300]}}
print("LAYOUTJSON:" + json.dumps(out))
"""


def run_layout(cpus: int, sp: int, names: list[str], sf_dir: str) -> dict:
    code = _RUNNER.format(repo=REPO, cpus=cpus, sp=sp, names=names,
                          sf_dir=sf_dir)
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    p = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=1800)
    for line in p.stdout.splitlines():
        if line.startswith("LAYOUTJSON:"):
            return json.loads(line[len("LAYOUTJSON:"):])
    raise RuntimeError(
        f"layout local[{cpus}]/sp={sp} produced no result "
        f"(rc={p.returncode}):\n{p.stderr[-2000:]}")


def main():
    args = [a for a in sys.argv[1:]]
    if args and (os.sep in args[0] or args[0].startswith(".")):
        # path-like first arg: a typo'd sf_dir must error out, not be
        # silently treated as a query name under the default sf_dir
        if not os.path.isdir(args[0]):
            sys.exit(f"layout_check: sf_dir {args[0]!r} does not exist")
        sf_dir = args.pop(0)
    else:
        sf_dir = "/root/testdata/sf0.01"
    names = args or DEFAULT_QUERIES

    results = {}
    for cpus, sp in LAYOUTS:
        print(f"--- layout local[{cpus}] shuffle_partitions={sp} ---",
              flush=True)
        results[(cpus, sp)] = run_layout(cpus, sp, names, sf_dir)

    base_key = LAYOUTS[0]
    base = results[base_key]
    n_fail = 0
    for name in names:
        cells = {k: results[k].get(name) for k in results}
        errs = {k: c for k, c in cells.items() if c and "error" in c}
        if errs:
            print(f"FAIL  {name}: errors {errs}")
            n_fail += 1
            continue
        hashes = {k: c["hash"] for k, c in cells.items()}
        if len(set(hashes.values())) == 1:
            print(f"ok    {name}: {base[name]['rows']} rows, "
                  f"identical across {len(LAYOUTS)} layouts")
        else:
            print(f"FAIL  {name}: layout-sensitive output {hashes}")
            n_fail += 1
    print(f"\n{len(names) - n_fail} ok, {n_fail} layout-sensitive")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
