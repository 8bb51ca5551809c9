"""Structured Streaming operators: watermarked windowed rollups, a
streaming DP counter, and stateful sessionization
(applyInPandasWithState)."""

from .documents import (
    document_ingest_pipeline,
    make_index_dedup_batch_fn,
    read_document_stream,
    streaming_dedup_exact,
)
from .events import (
    dp_windowed_counts,
    enrich_with_dimension,
    enriched_segment_rollup,
    read_event_stream,
    windowed_event_counts,
)
from .joins import stream_time_range_join
from .sessionize import sessionize_events

__all__ = [
    "document_ingest_pipeline",
    "dp_windowed_counts",
    "enrich_with_dimension",
    "enriched_segment_rollup",
    "make_index_dedup_batch_fn",
    "read_document_stream",
    "read_event_stream",
    "sessionize_events",
    "stream_time_range_join",
    "streaming_dedup_exact",
    "windowed_event_counts",
]
