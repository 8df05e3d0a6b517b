"""Batch-POST sink: ≤100-record chunks, per-partition, with retry.

Reference parity: S3 (pipeline.py:88-99) posts transformed records in
chunks of ``max(1, min(100, batch_size))`` (clamp pipeline.py:93);
T7 ``chunked`` (utils.py:9-12); X1/X2 reliability via
:func:`project_fauna_spark.sources.http.request_with_retry`.

Spark rendering: ``mapPartitions``-style batching via ``mapInPandas``
so every partition posts its own chunks in parallel and emits a
receipt row per batch — the driver never materializes the data
(the reference's sequential driver-side loop, pipeline.py:96-99,
becomes N-way parallel).  Null-vs-omitted T6: JSON bodies drop null
fields, matching pipeline.py:78-79.
"""

from __future__ import annotations

import json
from collections.abc import Iterable, Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame

from project_fauna_spark.sources.http import (
    RetryPolicy,
    TransportFactory,
    request_with_retry,
)


def clamp_batch_size(size: int) -> int:
    """Reference clamp to [1, 100] (pipeline.py:93)."""
    return max(1, min(100, size))


def chunked(seq: Sequence, size: int) -> Iterable[list]:
    """Successive ≤size slices (reference utils.py:9-12)."""
    for i in range(0, len(seq), size):
        yield list(seq[i : i + size])


def post_batches_with_receipts(
    df: DataFrame,
    transport_factory: TransportFactory,
    sink_path: str = "/animals/v1/home",
    batch_size: int = 100,
    policy: RetryPolicy = RetryPolicy(),
) -> DataFrame:
    """POST ``df`` in ≤100-record JSON batches; returns receipt rows.

    One transport per partition (connection reuse), chunks sized by the
    reference clamp, each POST wrapped in retry/backoff.  The returned
    DataFrame (one row per posted batch) is lazy — the sink runs when
    an action consumes the receipts, keeping it composable in a plan.
    """
    size = clamp_batch_size(batch_size)
    columns = df.columns

    def post_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        transport = transport_factory()
        rows: list[dict] = []
        for pdf in batches:
            for rec in pdf.to_dict(orient="records"):
                # T6: null fields are omitted, not serialized as null.
                rows.append({k: v for k, v in rec.items() if not pd.isna(v)})
        receipts = []
        for i, chunk in enumerate(chunked(rows, size)):
            body = json.dumps(chunk, default=str)
            status, _ = request_with_retry(transport, "POST", body, policy)
            receipts.append({"batch_index": i, "n_records": len(chunk), "status": status})
        yield pd.DataFrame(receipts, columns=["batch_index", "n_records", "status"]).astype(
            {"batch_index": "int64", "n_records": "int64", "status": "int64"}
        )

    _ = columns
    return df.mapInPandas(post_partition, schema="batch_index long, n_records long, status long")


def post_batches_globally_indexed(
    df: DataFrame,
    transport_factory: TransportFactory,
    order_col: str,
    sink_path: str = "/animals/v1/home",
    batch_size: int = 100,
    policy: RetryPolicy = RetryPolicy(),
    bucket_rows: int = 1024,
) -> DataFrame:
    """POST ``df`` in ≤100-record batches with GLOBALLY deterministic
    chunk boundaries — no single-partition funnel.

    Rows get a global row number in ``order_col`` order via a bucketed
    two-level cumsum (local window per ``order_col div bucket_rows``
    bucket + a tiny broadcast offset table — never one task for the
    whole sink), then ``batch_id = row_number div batch_size`` keys an
    ``applyInPandas`` group: one POST per batch, batches spread across
    executors by the batch_id shuffle.  Receipts are identical to a
    sequential single-writer chunking of the ``order_col``-sorted
    rows, so re-runs (and the oracle) see the same batch set
    regardless of input partitioning.
    """
    from pyspark.sql import Window as W, functions as F

    size = clamp_batch_size(batch_size)

    bkt = F.expr(f"{order_col} div {bucket_rows}")
    w_local = W.partitionBy("__bkt").orderBy(order_col)
    w_off = W.partitionBy(F.lit(1)).orderBy("__bkt").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    rows = df.withColumn("__bkt", bkt).withColumn(
        "__local_rn", F.row_number().over(w_local)
    )
    offsets = (
        rows.groupBy("__bkt")
        .agg(F.count("*").alias("__n"))
        .withColumn("__offset", F.sum("__n").over(w_off) - F.col("__n"))
        .select("__bkt", "__offset")
    )
    keyed = (
        rows.join(F.broadcast(offsets), "__bkt")
        .withColumn("__rn", F.col("__local_rn") + F.col("__offset") - 1)
        .withColumn("__batch_id", F.expr(f"__rn div {size}"))
        .drop("__bkt", "__local_rn", "__offset")
    )
    data_cols = [c for c in df.columns]

    def post_group(pdf: pd.DataFrame) -> pd.DataFrame:
        transport = transport_factory()
        pdf = pdf.sort_values("__rn")
        batch_id = int(pdf["__batch_id"].iloc[0])
        recs = []
        for rec in pdf[data_cols].to_dict(orient="records"):
            recs.append({k: v for k, v in rec.items() if not pd.isna(v)})
        body = json.dumps(recs, default=str)
        status, _ = request_with_retry(transport, "POST", body, policy)
        return pd.DataFrame(
            [{"batch_index": batch_id, "n_records": len(recs), "status": status}]
        ).astype({"batch_index": "int64", "n_records": "int64", "status": "int64"})

    return keyed.groupBy("__batch_id").applyInPandas(
        post_group, schema="batch_index long, n_records long, status long"
    )
