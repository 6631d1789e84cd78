"""Chained regex redaction (pure column expressions, JVM-side).

Reference parity (pattern-for-pattern):
  F1 email     ``src/preprocessing/preprocessor.py:10``
  F2 card      ``src/preprocessing/preprocessor.py:11``
  F3 email v2  ``src/llm/llm_processor.py:109``
  F4 api-key   ``src/llm/llm_processor.py:110``
  F5 token     ``src/llm/llm_processor.py:111``
  F6 chaining  ``src/preprocessing/preprocessor.py:20-22``

The reference applies these per-row in a Python loop; here each pattern is a
``regexp_replace`` column expression, so the whole chain stays inside
whole-stage codegen — no Python boundary, fully vectorized, scales linearly
with input splits. Patterns were validated to behave identically under
Java regex (golden pairs in tests/test_functions.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: preprocessor-side patterns (preprocessor.py:9-12)
DEFAULT_PATTERNS: list[tuple[str, str]] = [
    (r"[\w\.-]+@[\w\.-]+", "[REDACTED_EMAIL]"),
    (r"\b(?:\d[ -]*?){13,16}\b", "[REDACTED_CARD]"),
]

#: LLM-side patterns (llm_processor.py:107-112)
LLM_SIDE_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+", "[REDACTED_EMAIL]"),
    (r"(?i)api[_-]?key\s*[:=]\s*\w+", "api_key=[REDACTED]"),
    (r"(?i)token\s*[:=]\s*\w+", "token=[REDACTED]"),
]


def redact(col: Column | str,
           patterns: list[tuple[str, str]] | None = None) -> Column:
    """Apply a redaction pattern chain sequentially (F6 fold)."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, repl in (patterns if patterns is not None else DEFAULT_PATTERNS):
        c = F.regexp_replace(c, pat, repl)
    return c
