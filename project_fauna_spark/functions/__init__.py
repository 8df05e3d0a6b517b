"""Scalar / expression-builder surface of the engine.

Everything in this package returns Catalyst ``Column`` expressions built
from ``pyspark.sql.functions`` — no Python UDFs in the hot path, so all
of it stays inside whole-stage codegen.
"""

from project_fauna_spark.functions.reference import (
    split_friends,
    epoch_to_timestamp_utc,
    epoch_to_iso8601_utc,
    format_iso8601_z,
    validate_iso8601_utc,
    batch_index,
)

__all__ = [
    "split_friends",
    "epoch_to_timestamp_utc",
    "epoch_to_iso8601_utc",
    "format_iso8601_z",
    "validate_iso8601_utc",
    "batch_index",
]
