"""Structured Streaming operators: watermarked windowed rollups, a
streaming DP counter, and stateful sessionization
(applyInPandasWithState)."""

from .events import (
    dp_windowed_counts,
    read_event_stream,
    windowed_event_counts,
)
from .sessionize import sessionize_events

__all__ = [
    "dp_windowed_counts",
    "read_event_stream",
    "sessionize_events",
    "windowed_event_counts",
]
