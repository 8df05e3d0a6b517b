"""PySpark 4 Python Data Source: the paginated HTTP API as a real
``spark.read.format(...)`` source.

The mapInPandas helpers in :mod:`project_fauna_spark.sources.http`
are the portable implementation; this is the idiomatic Spark-4
integration of the same scan: a registered ``DataSource`` whose
planner probes page 1 for ``total_pages`` and emits ONE InputPartition
PER PAGE — so Spark schedules pages exactly like file splits
(locality-free, retryable per task, parallelism = page count).

Usage::

    spark.dataSource.register(FaunaAnimalsDataSource)
    df = (spark.read.format("fauna_animals")
          .option("fixture_root", "/path/to/fixture")
          .load())

Reference parity: S1's listing envelope (page/total_pages/items,
models.py:23-26) and detail records; the retry taxonomy applies via
the shared transport helpers.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql import types as T

from project_fauna_spark.sources.http import (
    FileBackedTransport,
    RetryPolicy,
    _safe_json,
    request_with_retry,
)

ANIMALS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("page", T.IntegerType()),
    ]
)


class _PagePartition(InputPartition):
    def __init__(self, page: int):
        self.page = page


def _parse_options(options: dict) -> tuple[str, str, RetryPolicy]:
    """Shared option contract for the batch and streaming readers."""
    root = options.get("fixture_root")
    if not root:
        raise ValueError("fauna_animals requires option 'fixture_root'")
    base_path = options.get("base_path", "/animals/v1/animals")
    policy = RetryPolicy(
        retries=int(options.get("retries", 6)),
        backoff_base=float(options.get("backoff_base", 0.25)),
    )
    return root, base_path, policy


class FaunaAnimalsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.root, self.base_path, self.policy = _parse_options(options)

    def partitions(self) -> list[InputPartition]:
        # Planner-side probe: ONE request to learn total_pages, then
        # one InputPartition per page (the S1 fan-out as real scan
        # partitions).
        transport = FileBackedTransport(self.root)
        _, body = request_with_retry(
            transport, "GET", f"{self.base_path}?page=1", self.policy
        )
        first = _safe_json(body, {"total_pages": 1})
        total = int(first.get("total_pages", 1))
        return [_PagePartition(p) for p in range(1, total + 1)]

    def read(self, partition: _PagePartition) -> Iterator[tuple]:
        transport = FileBackedTransport(self.root)
        _, body = request_with_retry(
            transport, "GET", f"{self.base_path}?page={partition.page}", self.policy
        )
        payload = _safe_json(body, {"items": []})
        for item in payload.get("items", []):
            yield (int(item["id"]), item.get("name"), partition.page)


class FaunaAnimalsDataSource(DataSource):
    """``format("fauna_animals")`` — paginated listing scan source."""

    @classmethod
    def name(cls) -> str:
        return "fauna_animals"

    def schema(self) -> T.StructType:
        return ANIMALS_SCHEMA

    def reader(self, schema: T.StructType) -> DataSourceReader:
        return FaunaAnimalsReader(self.options)

    def simpleStreamReader(self, schema: T.StructType) -> SimpleDataSourceStreamReader:
        return FaunaAnimalsStreamReader(self.options)


class FaunaAnimalsStreamReader(SimpleDataSourceStreamReader):
    """Streaming page replay: one listing page per micro-batch.

    Offsets are ``{"page": n}`` (pages consumed so far), so restarts
    and ``readBetweenOffsets`` replays are exact — the checkpoint
    contract Structured Streaming requires for exactly-once sinks.
    The simple (driver-side) reader is the right tradeoff for a
    cursor-paginated API: the cursor is inherently serial, and each
    batch is one bounded page; the partition-parallel batch reader
    above remains the backfill path.
    """

    def __init__(self, options: dict):
        self.root, self.base_path, self.policy = _parse_options(options)
        self._total: int | None = None

    def _fetch(self, page: int) -> dict:
        transport = FileBackedTransport(self.root)
        _, body = request_with_retry(
            transport, "GET", f"{self.base_path}?page={page}", self.policy
        )
        return _safe_json(body, {"items": [], "total_pages": 1})

    def initialOffset(self) -> dict:
        return {"page": 0}

    def _rows(self, payload: dict, page: int) -> list[tuple]:
        return [
            (int(item["id"]), item.get("name"), page)
            for item in payload.get("items", [])
        ]

    def read(self, start: dict):
        nxt = int(start["page"]) + 1
        if self._total is None or nxt > self._total:
            # Probe (or re-probe, in case the collection grew) only
            # when the cursor is at/past the known end — otherwise
            # every micro-batch would pay a second request.
            probe = self._fetch(1)
            self._total = int(probe.get("total_pages", 1))
            if nxt == 1:
                if self._total < 1:
                    return iter([]), start
                return iter(self._rows(probe, 1)), {"page": 1}
        if nxt > self._total:
            return iter([]), start
        return iter(self._rows(self._fetch(nxt), nxt)), {"page": nxt}

    def readBetweenOffsets(self, start: dict, end: dict):
        rows: list[tuple] = []
        for page in range(int(start["page"]) + 1, int(end["page"]) + 1):
            rows.extend(self._rows(self._fetch(page), page))
        return iter(rows)

    def commit(self, end: dict) -> None:
        pass
