"""File sink helpers: partitioned, size-bounded writes.

The 100 TB output contract: data lands partitioned by a pruning key
(readers skip irrelevant partitions), with bounded file sizes
(``maxRecordsPerFile`` prevents the giant-file stragglers that stall
downstream readers), and without tiny-file explosions (repartition on
the partition key first so each partition directory gets few writers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    max_records_per_file: int = 1_000_000,
    mode: str = "overwrite",
) -> None:
    """Partitioned parquet write with bounded file sizes.

    Repartitioning on the partition columns first maps each output
    directory to one task's worth of files (no N-tasks × M-partitions
    small-file product); ``maxRecordsPerFile`` then splits oversized
    partitions into bounded files.
    """
    (
        df.repartition(*partition_by)
        .write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_by)
        .parquet(path)
    )
