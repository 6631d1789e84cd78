#!/usr/bin/env bash
# Pre-snapshot gate: run BOTH local harnesses over the FULL registry, fail
# the round on any red. Round 2 shipped a regression that the driver's
# 50-query correctness sample missed but both of these caught — so every
# end-of-round commit must pass this first.
#
# Usage: tools/gate.sh [sf_dir]       (default /root/testdata/sf0.01)
set -euo pipefail
cd "$(dirname "$0")/.."
SF_DIR="${1:-/root/testdata/sf0.01}"

echo "=== gate 1/3: pytest ==="
python -m pytest tests/ -q

echo "=== gate 2/3: full oracle registry @ ${SF_DIR} ==="
python tools/check_oracles.py "${SF_DIR}"   # exits 1 on any FAIL

echo "=== gate 3/3: bench smoke (sf0.01, one run per query) ==="
SPARK_GRAFT_SF_DIR="${SF_DIR}" SPARK_GRAFT_BENCH_RUNS=1 python bench.py > /tmp/gate_bench.json
python - <<'EOF'
import json
with open("/tmp/gate_bench.json") as f:
    d = json.loads(f.read().strip().splitlines()[-1])
assert d["queries"], "bench produced no per-query timings"
print(f"bench ok: {len(d['queries'])} queries, {d['value']}s total")
EOF

echo "GATE GREEN"
