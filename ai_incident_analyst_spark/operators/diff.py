"""Table snapshot diff: what changed between two versions of a table.

The regression-testing primitive for pipeline development at scale: run
the candidate pipeline, diff its output against the blessed snapshot,
gate the deploy on "zero unexplained changes" — the same role the
driver's oracle gate plays for this repo, packaged as an operator.
Also the audit tool for MERGE/compaction correctness
(``sources/layout.py``): a rewrite that claims byte-identity can prove
it with an empty diff.

Physical design: ONE full-outer join on the key (single keyed shuffle
per side, AQE-broadcast when one snapshot is small) with row content
compared via null-safe struct equality — JVM-side, no serialization to
strings, no Python. Output is row-level (``added`` / ``removed`` /
``changed``); the summary form aggregates it in the same pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(old: DataFrame, new: DataFrame,
               keys: list[str]) -> DataFrame:
    """Row-level diff ``(key..., change)`` with ``change`` ∈
    {added, removed, changed}; unchanged rows are omitted. Non-key
    columns must match by name (schema drift is a diff you resolve
    first, not silently ignore — mismatched columns raise).
    """
    val_cols = [c for c in old.columns if c not in keys]
    if set(old.columns) != set(new.columns):
        raise ValueError(
            f"schemas differ: only-old={set(old.columns) - set(new.columns)} "
            f"only-new={set(new.columns) - set(old.columns)}")
    o = old.select(*keys, F.struct(*val_cols).alias("__old"))
    n = new.select(*keys, F.struct(*val_cols).alias("__new"))
    j = o.join(n, keys, "full_outer")
    change = (
        F.when(F.col("__old").isNull(), F.lit("added"))
        .when(F.col("__new").isNull(), F.lit("removed"))
        .when(~F.col("__old").eqNullSafe(F.col("__new")),
              F.lit("changed"))
    )
    return (
        j.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(*keys, "change")
    )


def diff_summary(old: DataFrame, new: DataFrame,
                 keys: list[str]) -> DataFrame:
    """Aggregate form: ``(change, n)`` — the deploy-gate number."""
    return (
        table_diff(old, new, keys)
        .groupBy("change").agg(F.count("*").alias("n"))
    )
