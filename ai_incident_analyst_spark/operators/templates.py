"""Log template mining: collapse free-form log messages into templates by
masking the variable fragments (ids, numbers, addresses), then count and
profile each template.

This is the batch analog of what incident tooling calls "log patterns"
(Drain-style template extraction): the reference clusters similar logs by
embedding + k-NN (src/vector_db/faiss_db.py:49-61); template mining is the
cheap, exact, scan-speed complement — two logs share a template iff they
are equal after masking. Pure ``regexp_replace`` chains: JVM codegen,
no shuffle until the final count aggregation, and the mask patterns use
the Java-regex/RE2 common subset (no lookarounds) so a DuckDB oracle can
replay them verbatim.

At 100 TB the pattern is: mask (narrow, scan-speed) -> groupBy(template)
(one shuffle whose cardinality is the number of DISTINCT templates --
tiny, since masking is exactly what collapses the long tail of distinct
messages) -> per-template stats. Partial aggregation does almost all the
work map-side because masked duplicates are dense within partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (pattern, replacement) chain, applied IN ORDER — most specific first so
#: e.g. a UUID is masked as one <UUID>, not four <NUM>/<HEX> fragments.
#: Patterns are the Java/RE2 common subset: character classes, bounded
#: repetition, \b word boundaries; no lookarounds, no backrefs.
TEMPLATE_MASKS: tuple[tuple[str, str], ...] = (
    # 8-4-4-4-12 hex UUIDs
    (r"\b[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}"
     r"-[0-9a-fA-F]{12}\b", "<UUID>"),
    # dotted-quad IPv4 (mask before generic numbers eat the octets)
    (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    # 0x-prefixed or long bare hex runs (pointers, trace ids, digests)
    (r"\b0x[0-9a-fA-F]+\b", "<HEX>"),
    (r"\b[0-9a-fA-F]{16,}\b", "<HEX>"),
    # decimal numbers, including fractions — the bulk of log variability
    (r"[0-9]+(\.[0-9]+)?", "<NUM>"),
)


def mask_template(col: Column | str,
                  masks: tuple[tuple[str, str], ...] = TEMPLATE_MASKS) -> Column:
    """The template of a message: variable fragments replaced by typed
    placeholders. Spark ``regexp_replace`` is replace-ALL by default
    (DuckDB needs the explicit ``'g'`` flag — see ``mask_template_sql``)."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, repl in masks:
        c = F.regexp_replace(c, pat, repl)
    return c


def mask_template_sql(expr: str,
                      masks: tuple[tuple[str, str], ...] = TEMPLATE_MASKS) -> str:
    """The identical mask chain as a DuckDB SQL expression (oracle twin).
    Single-quotes in patterns would need escaping; the shipped masks use
    none."""
    for pat, repl in masks:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    return expr


def mine_templates(df: DataFrame, msg_col: str,
                   keys: list[str] | None = None,
                   masks: tuple[tuple[str, str], ...] = TEMPLATE_MASKS
                   ) -> DataFrame:
    """Group rows by (keys..., template) and profile each template:
    ``n_events``, ``n_users`` (when a ``user_id`` column exists) and the
    lexicographically-first raw message as a concrete ``example``.

    The example is ``min(raw)`` — deterministic under any partitioning
    (an arbitrary ``first()`` would not be), and mergeable map-side.
    """
    keys = list(keys or [])
    tpl = mask_template(msg_col, masks).alias("template")
    aggs = [
        F.count("*").alias("n_events"),
        F.min(F.col(msg_col)).alias("example"),
    ]
    if "user_id" in df.columns and "user_id" not in keys:
        aggs.insert(1, F.countDistinct("user_id").alias("n_users"))
    return df.groupBy(*keys, tpl).agg(*aggs)
