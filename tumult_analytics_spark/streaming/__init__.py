"""Structured Streaming operators: watermarked windowed rollups and a
streaming DP counter."""

from .events import (
    dp_windowed_counts,
    read_event_stream,
    windowed_event_counts,
)
