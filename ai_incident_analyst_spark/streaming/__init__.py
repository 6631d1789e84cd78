from .pipeline import (
    streaming_count_by_window,
    streaming_dedup,
    streaming_history_sink,
)

__all__ = [
    "streaming_count_by_window", "streaming_dedup", "streaming_history_sink",
]
