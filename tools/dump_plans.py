"""Dump .explain("formatted") for named registry queries to files.

Optimization-round evidence: the judge checks plan claims against
committed plans/rNN/<query>_{before,after}.txt files.

Usage: python tools/dump_plans.py [--precheckpoint] <suffix> <out_dir> \
           <name> [name ...]
  suffix: "before" or "after" (with --precheckpoint the files are
  named <name>_<suffix>_precheckpoint.txt)

Each query is built fresh after clear_session_memos() so the captured
plan is the full per-cell plan (the bench's isolation semantics), not a
memoized localCheckpoint read.

--precheckpoint (r14): build the plan with DataFrame.localCheckpoint
patched to identity (the tools/plan_audit.py dagger-row mechanism), so
iterative operators whose committed plan is a checkpoint-truncated stub
(nn_descent, the CC trio, graph_ann_batch) show their real tree.
Nothing executes during an explain, so no cache is left behind; shared
subtrees print once per REFERENCE, not per runtime materialization.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

# r13 ADVICE: don't hardcode the checkout path — derive it like
# ab_code_runner.py does, so the tool dumps plans for the code it sits in
_ROOT = os.environ.get(
    "SPARK_GRAFT_REPO_ROOT",
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, _ROOT)

from ai_incident_analyst_spark.queries import REGISTRY, clear_session_memos
from ai_incident_analyst_spark.session import get_spark


class _identity_checkpoints:
    """Patch localCheckpoint to identity while building a plan (same
    class as tools/plan_audit.py — both the abstract base and the
    classic implementation must be patched on Spark 4)."""

    def _classes(self):
        from pyspark.sql import DataFrame
        from pyspark.sql.classic.dataframe import DataFrame as CDataFrame
        return (DataFrame, CDataFrame)

    def __enter__(self):
        self._orig = [(c, c.localCheckpoint) for c in self._classes()]
        for c in self._classes():
            c.localCheckpoint = lambda df, eager=True: df
        return self

    def __exit__(self, *exc):
        for c, orig in self._orig:
            c.localCheckpoint = orig
        return False


def main():
    args = sys.argv[1:]
    precheckpoint = False
    if args and args[0] == "--precheckpoint":
        precheckpoint = True
        args = args[1:]
    suffix, out_dir = args[0], args[1]
    names = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dump_plans")
    ctx = _identity_checkpoints() if precheckpoint else contextlib.nullcontext()
    tag = f"{suffix}_precheckpoint" if precheckpoint else suffix
    for name in names:
        clear_session_memos()
        spark.catalog.clearCache()
        try:
            with ctx:
                df = REGISTRY[name].fn(spark, sf_dir)
                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
            text = buf.getvalue()
        except Exception as e:  # keep going; a failed build is itself news
            text = f"ERROR building {name}: {e!r}\n"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"# wrote {path} ({len(text)} bytes)", file=sys.stderr)


if __name__ == "__main__":
    main()
