"""Structured Streaming surface (EXT — SURVEY.md §2.9/§7 Phase 4).

The reference declared spark-streaming as a dependency but never used
it (build.sbt:25); this package supplies the streaming generalization
of its batch patterns: windowed aggregation, sessionization, and
late-data dedup over the events stream, plus a streaming ingestion
path for the metrics store.
"""

from .events import (
    events_stream,
    sliding_counts_stream,
    session_window_stream,
    tumbling_counts_stream,
)

__all__ = [
    "events_stream",
    "sliding_counts_stream",
    "session_window_stream",
    "tumbling_counts_stream",
]
