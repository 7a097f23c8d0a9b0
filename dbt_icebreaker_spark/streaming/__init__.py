from .pipeline import (
    sessionize,
    stream_incremental_append,
    windowed_counts,
)

from .cep import pattern_detect_batch, stream_pattern_detect

__all__ = [
    "stream_incremental_append",
    "windowed_counts",
    "sessionize",
    "stream_pattern_detect",
    "pattern_detect_batch",
]
