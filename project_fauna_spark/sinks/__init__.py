"""Sink substrate: chunked batch-POST with retry (reference S3/X1/X2)."""

from project_fauna_spark.sinks.batch_post import (
    chunked,
    post_batches_globally_indexed,
    post_batches_with_receipts,
)

__all__ = ["chunked", "post_batches_globally_indexed", "post_batches_with_receipts"]
