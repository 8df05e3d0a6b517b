"""Structured Streaming smoke tests: file-replay parity with batch,
and a live rate-source liveness check."""

from __future__ import annotations

import time

import pytest

from project_fauna_spark.operators.streaming_batch import stream_tumbling_window
from project_fauna_spark.streaming import (
    events_file_stream,
    rate_stream,
    run_available_now,
    tumbling_counts_stream,
)

SF = "/root/testdata/sf0.001"


def test_file_stream_matches_batch(spark):
    """Replaying events as a stream must reproduce the batch windows."""
    stream = events_file_stream(spark, SF)
    assert stream.isStreaming
    got = run_available_now(tumbling_counts_stream(stream))
    batch = stream_tumbling_window(spark, SF)
    g = {tuple(r) for r in got.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert g == b


def test_rate_stream_produces_rows(spark):
    """Rate source → windowed count stays live and emits rows."""
    agg = (
        tumbling_counts_stream(rate_stream(spark, rows_per_second=200), watermark="10 seconds")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("rate_smoke")
        .outputMode("complete")
        .start()
    )
    try:
        deadline = time.time() + 60
        n = 0
        while time.time() < deadline:
            n = spark.table("rate_smoke").count()
            if n > 0:
                break
            time.sleep(2)
        assert n > 0
    finally:
        q.stop()
