from .redaction import DEFAULT_PATTERNS, LLM_SIDE_PATTERNS, redact
from .text import (
    concat_fields,
    day_trunc_str,
    format_log_line,
    keyword_search_json,
    normalize_message,
    truncate_display,
)
from .vectors import cosine_similarity, dot_product, l2_sq, to_double_array

__all__ = [
    "DEFAULT_PATTERNS", "LLM_SIDE_PATTERNS", "redact",
    "concat_fields", "day_trunc_str", "format_log_line",
    "keyword_search_json", "normalize_message", "truncate_display",
    "cosine_similarity", "dot_product", "l2_sq", "to_double_array",
]
