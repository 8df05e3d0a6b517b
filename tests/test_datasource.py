"""PySpark 4 Python DataSource: paginated API as format('fauna_animals')."""

from __future__ import annotations

import json
import os

import pytest


@pytest.fixture()
def fixture_root(tmp_path):
    root = str(tmp_path / "api")
    os.makedirs(root)
    records = [{"id": i, "name": f"A{i}"} for i in range(1, 26)]
    pages = [records[:10], records[10:20], records[20:]]
    for n, items in enumerate(pages, start=1):
        with open(os.path.join(root, f"listing_page_{n}.json"), "w") as f:
            json.dump({"page": n, "total_pages": len(pages), "items": items}, f)
    return root


def test_datasource_scan(spark, fixture_root):
    from project_fauna_spark.sources.datasource import FaunaAnimalsDataSource

    spark.dataSource.register(FaunaAnimalsDataSource)
    df = (
        spark.read.format("fauna_animals")
        .option("fixture_root", fixture_root)
        .load()
    )
    rows = df.collect()
    assert len(rows) == 25
    assert sorted(r["id"] for r in rows) == list(range(1, 26))
    # one partition per page
    assert df.rdd.getNumPartitions() == 3
    by_page = {r["id"]: r["page"] for r in rows}
    assert by_page[1] == 1 and by_page[25] == 3


def test_datasource_stream_replays_all_pages(spark, fixture_root, tmp_path):
    from project_fauna_spark.sources.datasource import FaunaAnimalsDataSource

    spark.dataSource.register(FaunaAnimalsDataSource)
    stream = (
        spark.readStream.format("fauna_animals")
        .option("fixture_root", fixture_root)
        .load()
    )
    assert stream.isStreaming
    query = (
        stream.writeStream.format("memory")
        .queryName("fauna_stream_pages")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        query.processAllAvailable()
        rows = spark.sql("SELECT * FROM fauna_stream_pages").collect()
    finally:
        query.stop()
    assert sorted(r["id"] for r in rows) == list(range(1, 26))
    # one page per micro-batch: the page column proves batch boundaries
    assert {r["page"] for r in rows} == {1, 2, 3}


def test_datasource_stream_restart_is_exactly_once(spark, fixture_root, tmp_path):
    """Stop after the first micro-batch, restart on the same
    checkpoint: the file sink must end with every row exactly once —
    the offset/readBetweenOffsets contract under restart."""
    from pyspark.sql import functions as F

    from project_fauna_spark.sources.datasource import FaunaAnimalsDataSource

    spark.dataSource.register(FaunaAnimalsDataSource)
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")

    def start(processing_time=None):
        w = (
            spark.readStream.format("fauna_animals")
            .option("fixture_root", fixture_root)
            .load()
            .writeStream.format("parquet")
            .option("checkpointLocation", ckpt)
            .option("path", out)
        )
        if processing_time is not None:
            w = w.trigger(processingTime=processing_time)
        return w.start()

    # Phase 1: a long processing-time trigger fires batch 0 immediately
    # and would not start batch 1 for minutes — stopping once
    # lastProgress appears guarantees exactly ONE committed micro-batch
    # (one page), so the restart genuinely resumes mid-stream.
    import time

    q = start(processing_time="300 seconds")
    try:
        deadline = time.time() + 120
        while q.lastProgress is None and time.time() < deadline:
            time.sleep(0.2)
        assert q.lastProgress is not None, "first micro-batch never committed"
    finally:
        q.stop()
    mid_ids = sorted(r["id"] for r in spark.read.parquet(out).collect())
    assert 0 < len(mid_ids) < 25, f"expected a strict subset after one batch, got {len(mid_ids)}"

    # Phase 2: restart on the same checkpoint must replay ONLY the
    # unconsumed pages — every id exactly once across both runs.
    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    rows = spark.read.parquet(out).collect()
    assert sorted(r["id"] for r in rows) == list(range(1, 26))
