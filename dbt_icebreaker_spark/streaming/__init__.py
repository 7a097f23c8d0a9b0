from .pipeline import (
    sessionize,
    stream_incremental_append,
    windowed_counts,
)

__all__ = ["stream_incremental_append", "windowed_counts", "sessionize"]
