"""Scalar text/format functions (SURVEY.md §2.7), all JVM built-ins.

Reference parity:
  F7  message coercion          preprocessor.py:17-19
  F9  null-skipping concat      embedder.py:19-21
  F10 lowercase normalization   app.py:66-80
  F11 substring day-truncate    app.py:24
  F12/W6 display truncation     templates/home.html:49
  F17 line formatting           llm_processor.py:37,40,99
  F18/P9 whole-record search    app.py:78-82
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalize_message(col: Column | str) -> Column:
    """F7: None → "", non-string → string (preprocessor.py:17-19)."""
    return F.coalesce(_c(col).cast("string"), F.lit(""))


def concat_fields(*cols: Column | str, sep: str = " ") -> Column:
    """F9: join fields with sep, skipping nulls — exact `concat_ws`
    semantics match for embedder.py:19-21's text assembly."""
    return F.concat_ws(sep, *[_c(c) for c in cols])


def day_trunc_str(ts_col: Column | str) -> Column:
    """F11: `timestamp[:10]` day bucket (app.py:24) as a yyyy-MM-dd string."""
    return F.date_format(_c(ts_col), "yyyy-MM-dd")


def truncate_display(col: Column | str, n: int = 80) -> Column:
    """W6: `s[:80] + '...'` only when longer (templates/home.html:49)."""
    c = _c(col)
    return F.when(F.length(c) > n, F.concat(F.substring(c, 1, n), F.lit("..."))) \
            .otherwise(c)


def format_log_line(ts: Column | str, service: Column | str,
                    level: Column | str, message: Column | str) -> Column:
    """F17: `- {ts} | {svc} | {lvl} | {msg}` (llm_processor.py:37)."""
    return F.format_string("- %s | %s | %s | %s",
                           _c(ts), _c(service), _c(level), _c(message))


def keyword_search_json(df: DataFrame, keyword: str) -> DataFrame:
    """P9/F18: serialize the whole row to JSON, lowercase, substring-match
    (app.py:78-82). Exercises `to_json` over the full struct; Catalyst keeps
    this in codegen — no Python loop over rows as in the reference."""
    blob = F.lower(F.to_json(F.struct(*[F.col(c) for c in df.columns])))
    return df.filter(blob.contains(keyword.lower()))
