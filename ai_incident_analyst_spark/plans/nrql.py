"""NRQL-dialect string frontend: parse the reference's query strings
directly into LogQuery plans.

The reference's entire user-facing query surface is an NRQL string
(``src/ingestion/new_relic_fetcher.py:70-80`` composes one; ``main.py:19-25``
rewrites one with regexes). A user switching to this engine can hand those
same strings to ``parse_nrql`` and get a DataFrame plan with the clauses
mapped declaratively — no string surgery downstream, and the time-window
"rewrite" (main.py:21-25) becomes just calling ``since/until`` again.

Dialect (the subset the reference emits, exactly):

    SELECT `c1`,`c2` | count(*) | *
    FROM Table[, Table2 …]
    [WHERE `col` = 'v' [AND `col` != 'v'] [AND `col` LIKE '%x%']
                       [AND `col` NOT LIKE '%y%'] …]       -- AND-only
    [SINCE <n> <unit> ago | SINCE '<ts>']
    [UNTIL '<ts>']
    [LIMIT n]

Not supported (the reference never emits them): OR, grouping parens,
FACET/TIMESERIES, quoted strings containing the literal words SINCE/UNTIL/
LIMIT. Parsing is case-insensitive for keywords, preserving for values.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import union_tables
from .logquery import LogQuery

_CLAUSES = re.compile(
    r"^\s*SELECT\s+(?P<select>.+?)"
    r"\s+FROM\s+(?P<tables>.+?)"
    r"(?:\s+WHERE\s+(?P<where>.+?))?"
    r"(?:\s+SINCE\s+(?P<since>(?:'[^']*')|(?:.+?(?=\s+UNTIL\s|\s+LIMIT\s|$))))?"
    r"(?:\s+UNTIL\s+(?P<until>(?:'[^']*')|\S+))?"
    r"(?:\s+LIMIT\s+(?P<limit>\d+))?"
    r"\s*$",
    re.IGNORECASE | re.DOTALL,
)

_COND = re.compile(
    r"^\s*`?(?P<col>\w+)`?\s+"
    r"(?P<op>=|!=|NOT\s+LIKE|LIKE)\s+"
    r"'(?P<val>[^']*)'\s*$",
    re.IGNORECASE,
)


@dataclass
class ParsedNRQL:
    select: list[str]          # [] means count(*) probe; ["*"] means all
    tables: list[str]
    conds: list[tuple[str, str, str]]  # (col, OP, value), OP uppercased
    since: str | None
    until: str | None
    limit: int | None = None
    is_count: bool = field(default=False)


def parse_nrql(query: str) -> ParsedNRQL:
    m = _CLAUSES.match(query.strip())
    if not m:
        raise ValueError(f"unparseable NRQL: {query!r}")
    sel_raw = m.group("select").strip()
    is_count = bool(re.fullmatch(r"count\s*\(\s*\*\s*\)", sel_raw, re.I))
    if is_count:
        select: list[str] = []
    elif sel_raw == "*":
        select = ["*"]
    else:
        select = [c.strip().strip("`") for c in sel_raw.split(",")]

    tables = [t.strip().strip("`") for t in m.group("tables").split(",")]

    conds: list[tuple[str, str, str]] = []
    if m.group("where"):
        for part in re.split(r"\s+AND\s+", m.group("where"), flags=re.I):
            cm = _COND.match(part)
            if not cm:
                raise ValueError(f"unparseable condition: {part!r}")
            op = re.sub(r"\s+", " ", cm.group("op").upper())
            conds.append((cm.group("col"), op, cm.group("val")))

    def _unquote(s: str | None) -> str | None:
        if s is None:
            return None
        s = s.strip()
        return s[1:-1] if s.startswith("'") and s.endswith("'") else s

    return ParsedNRQL(
        select=select, tables=tables, conds=conds,
        since=_unquote(m.group("since")), until=_unquote(m.group("until")),
        limit=int(m.group("limit")) if m.group("limit") else None,
        is_count=is_count,
    )


def run_nrql(spark: SparkSession, query: str,
             tables: dict[str, DataFrame], ts_col: str = "ts",
             now=None) -> DataFrame:
    """Execute an NRQL string against named DataFrames.

    ``tables`` maps NRQL table names to DataFrames; multi-table FROM unions
    them by name with missing columns allowed (S4/SO2 semantics). ``now``
    anchors relative SINCE windows for deterministic tests.
    """
    p = parse_nrql(query)
    missing = [t for t in p.tables if t not in tables]
    if missing:
        raise KeyError(f"unknown tables {missing}; have {sorted(tables)}")
    src = (tables[p.tables[0]] if len(p.tables) == 1
           else union_tables(*[tables[t] for t in p.tables]))

    lq = LogQuery(src, ts_col=ts_col)
    for col, op, val in p.conds:
        if op == "=":
            lq = lq.where(col, val)
        elif op == "!=":
            lq = lq.where_expr(F.col(col) != F.lit(val))
        elif op == "LIKE":
            lq = lq.like(col, val)
        elif op == "NOT LIKE":
            lq = lq.not_like(col, val)
    if p.since:
        lq = lq.since(p.since, now=now)
    if p.until:
        lq = lq.until(p.until, now=now)
    if p.select and p.select != ["*"]:
        lq = lq.select(*p.select)
    if p.limit is not None:
        lq = lq.limit(p.limit)
    out = lq.df()
    if p.is_count:
        out = out.agg(F.count("*").alias("count"))
    return out
