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


def test_stateful_user_profile(spark):
    """applyInPandasWithState: running per-user profile over a replay."""
    from project_fauna_spark.streaming.stateful import user_profile_stream
    from project_fauna_spark.streaming import events_file_stream
    import uuid

    stream = user_profile_stream(events_file_stream(spark, SF))
    name = f"state_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["user_id"]: r for r in spark.table(name).collect()}
    # Cross-check counts/sums against batch.
    from project_fauna_spark.io import load_table
    from pyspark.sql import functions as F

    batch = {
        r["user_id"]: r
        for r in load_table(spark, SF, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("tv"))
        .collect()
    }
    assert set(got) == set(batch)
    for uid, row in got.items():
        assert row["n_events"] == batch[uid]["n"]
        assert abs(row["total_value"] - batch[uid]["tv"]) < 1e-6


def test_foreach_batch_to_post_sink(spark, tmp_path):
    """Stream → foreachBatch → chunked batch-POST sink end-to-end."""
    from project_fauna_spark.streaming import events_file_stream
    from project_fauna_spark.streaming.pipelines import stream_to_batch_sink
    from project_fauna_spark.sinks.batch_post import post_batches_with_receipts
    from project_fauna_spark.sources.http import FileBackedTransport, RetryPolicy
    import json, os

    api_dir = str(tmp_path / "api")
    os.makedirs(api_dir)
    fast = RetryPolicy(retries=1, backoff_base=0.0, backoff_cap=0.0, jitter_max=0.0)
    received = []

    def sink_batch(df, batch_id):
        receipts = post_batches_with_receipts(
            df.select("event_id", "event_type", "value"),
            lambda: FileBackedTransport(api_dir),
            batch_size=100,
            policy=fast,
        )
        received.append(sum(r["n_records"] for r in receipts.collect()))

    stream = events_file_stream(spark, SF)
    stream_to_batch_sink(stream, sink_batch, str(tmp_path / "ckpt"))
    assert sum(received) == 1000  # all sf0.001 events delivered
    posts = os.listdir(os.path.join(api_dir, "posts"))
    total = 0
    for name in posts:
        with open(os.path.join(api_dir, "posts", name)) as f:
            batch = json.load(f)
            assert len(batch) <= 100
            total += len(batch)
    assert total == 1000
