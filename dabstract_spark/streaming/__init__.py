"""Structured Streaming variants of the events operators.

The reference has NO streaming surface (SURVEY §2.12) — this module is
the north-star extension: the same event semantics as operators/events.py
expressed over an unbounded source with watermarks for state cleanup.

Design: each batch operator in operators/events.py has a streaming twin
here built on the streaming-native primitive (window / session_window /
dropDuplicatesWithinWatermark) rather than the batch window-function
formulation, which streaming cannot execute. Tests drive both against
the same fixture with trigger=availableNow and assert equal results —
the metamorphic check that streaming never changes semantics.
"""

from dabstract_spark.streaming.ops import (
    latest_dedup_stream,
    run_to_memory,
    run_to_parquet,
    session_agg_stream,
    sliding_agg_stream,
    stateful_sessionizer,
    stream_events,
    tumbling_agg_stream,
)

__all__ = [
    "stream_events",
    "tumbling_agg_stream",
    "sliding_agg_stream",
    "session_agg_stream",
    "stateful_sessionizer",
    "latest_dedup_stream",
    "run_to_memory",
    "run_to_parquet",
]
