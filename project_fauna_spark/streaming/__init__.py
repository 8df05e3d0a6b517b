"""Structured Streaming surface of the engine.

The batch queries in ``operators/streaming_batch.py`` verify window
semantics against the DuckDB oracle; this package runs the SAME
aggregations as real streams (``readStream`` → watermark → windowed
agg → sink), because window()/session_window() are one Catalyst
operator in both modes.
"""

from project_fauna_spark.streaming.pipelines import (
    events_file_stream,
    rate_stream,
    run_available_now,
    sessionized_stream,
    tumbling_counts_stream,
)

__all__ = [
    "events_file_stream",
    "rate_stream",
    "run_available_now",
    "sessionized_stream",
    "tumbling_counts_stream",
]
