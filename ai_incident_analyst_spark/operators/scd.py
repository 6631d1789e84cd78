"""Slowly-changing-dimension (SCD type 2) assembly from a change log.

The warehouse-side primitive the reference's append-only history sink
(``src/llm/llm_processor.py:70-84``, S6) stops short of: given a stream
of per-key attribute changes, produce the versioned dimension — one row
per (key, version) with ``[valid_from, valid_to)`` intervals and a
current flag — so any fact table can be joined "as of" its event time.

Physical design: pure windows over the change log, one keyed shuffle:

- ``valid_to`` = ``lead(ts)`` per key (NULL = still current) — the
  interval assembly is a single window pass, no self-join, no per-row
  subquery.
- Consecutive no-op changes (same attribute values as the previous
  version) are collapsed FIRST with a ``lag`` comparison over the same
  window spec, so both windows share one (key, ts) sort — a run of
  identical snapshots costs one surviving version.
- Deterministic: ties on (key, ts) break by a caller-named ordinal
  column (ingest id), the same arrival-order contract as
  ``dedup_keep_first``.

At 100 TB the change log shuffles once on the key; a hot key's history
lands in one partition sorted by time — exactly the layout the window
needs. Point-in-time lookups against the result are plain range
predicates (``valid_from <= t AND (valid_to IS NULL OR t < valid_to)``),
which is also how the oracle twin states them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_apply(changes: DataFrame, key: str, ts_col: str,
               attrs: list[str], order_col: str | None = None) -> DataFrame:
    """Assemble SCD2 versions from a change log.

    Returns one row per surviving version: ``key, attrs..., valid_from,
    valid_to, is_current`` — ``valid_to`` NULL on the open version.
    ``order_col`` breaks same-timestamp ties (later ordinal wins the
    instant); when omitted, (key, ts) must be unique.
    """
    state = F.struct(*[F.col(a) for a in attrs])
    # 1) same-instant ties FIRST: the LAST arrival at a timestamp
    #    defines that instant's state (earlier ones would create
    #    zero-width intervals, and a no-op judgment must never compare
    #    against an arrival this step discards)
    resolved = changes
    if order_col is not None:
        w_ts = Window.partitionBy(key, ts_col).orderBy(
            F.col(order_col).desc())
        resolved = (
            resolved.withColumn("__rn", F.row_number().over(w_ts))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    # 2) collapse no-op changes: keep a change only when its attribute
    #    struct differs from the previous version (null-safe — the first
    #    row has no predecessor and always survives)
    w2 = Window.partitionBy(key).orderBy(F.col(ts_col).asc())
    deduped = (
        resolved.withColumn("__prev", F.lag(state).over(w2))
        .filter(F.col("__prev").isNull()
                | ~state.eqNullSafe(F.col("__prev")))
        .drop("__prev")
    )
    return (
        deduped
        .withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop(*([ts_col] if ts_col not in attrs else []))
        .select(key, *attrs, "valid_from", "valid_to", "is_current")
    )


def asof_lookup(facts: DataFrame, dim: DataFrame, key: str,
                ts_col: str) -> DataFrame:
    """Point-in-time join: each fact row picks the dimension version
    valid at its timestamp (range predicate on the assembled intervals).
    Facts with no valid version (before the first change) keep NULL
    attributes — a left join, never a dropped fact.
    """
    cond = (
        (facts[key] == dim[key])
        & (dim["valid_from"] <= facts[ts_col])
        & (dim["valid_to"].isNull() | (facts[ts_col] < dim["valid_to"]))
    )
    return facts.join(dim.drop("is_current"), cond, "left") \
        .drop(dim[key])
