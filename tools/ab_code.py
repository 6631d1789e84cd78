"""Counterbalanced code-version A/B orchestrator (r13 optimization).

Runs ab_code_runner.py in fresh JVMs alternating between two repo
roots in ABBA order (cancels linear load drift), with a load-settle
gate before every process (waits for 1-min loadavg to drop so one
JVM's shutdown doesn't contaminate the next cell — this VM's loadavg
swings 2-13 under its own churn). Each cell is best-of-N
(SPARK_GRAFT_AB_RUNS, default 3) within its JVM.

Usage:
  python tools/ab_code.py <before_root> <after_root> <n_pairs> <query>...
Prints every cell line, then a per-query summary of min/median per side.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time


def settle(ok: float = 2.0, budget: float = 240.0) -> float:
    t0 = time.time()
    load = os.getloadavg()[0]
    while load > ok and time.time() - t0 < budget:
        time.sleep(5)
        load = os.getloadavg()[0]
    return load


def run_cell(root: str, tag: str, names: list[str]) -> list[dict]:
    env = dict(os.environ, SPARK_GRAFT_REPO_ROOT=root, PYTHONPATH=root)
    here = os.path.dirname(os.path.abspath(__file__))
    out = subprocess.run(
        [sys.executable, os.path.join(here, "ab_code_runner.py"),
         tag] + names,
        env=env, capture_output=True, text=True, cwd="/tmp")
    rows = []
    for line in out.stdout.splitlines():
        try:
            rows.append(json.loads(line))
        except json.JSONDecodeError:
            pass
    if not rows:
        print(f"# {tag} cell produced no rows; stderr tail: "
              f"{out.stderr[-500:]}", file=sys.stderr)
    return rows


def main() -> None:
    before_root, after_root = sys.argv[1], sys.argv[2]
    n_pairs = int(sys.argv[3])
    names = sys.argv[4:]
    cells: list[dict] = []
    for p in range(n_pairs):
        # ABBA counterbalancing: even pairs run before-first
        order = [("before", before_root), ("after", after_root)]
        if p % 2 == 1:
            order.reverse()
        for tag, root in order:
            load = settle()
            rows = run_cell(root, tag, names)
            for r in rows:
                r["load_at_start"] = round(load, 2)
                cells.append(r)
                print(json.dumps(r), flush=True)
    for name in names:
        for tag in ("before", "after"):
            vals = [c["sec"] for c in cells
                    if c["query"] == name and c["tag"] == tag]
            if vals:
                print(f"# {name} {tag}: min {min(vals):.2f} "
                      f"median {statistics.median(vals):.2f} n={len(vals)}")


if __name__ == "__main__":
    main()
