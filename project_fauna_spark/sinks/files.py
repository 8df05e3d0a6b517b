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


def write_clustered_parquet(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Cluster-sorted parquet write (the poor-man's Z-order for one
    key prefix): range-partition into ``n_files`` splits by the
    cluster key, sort rows within each split, write.

    Each output file then covers a narrow, non-overlapping range of
    the cluster key, so its parquet row-group min/max stats become
    selective: a point or range predicate on the key prunes all but
    ~one file at scan time — the locality layout for a column queried
    constantly but unsuitable as a directory partition key (high
    cardinality).
    """
    (
        df.repartitionByRange(n_files, *cluster_by)
        .sortWithinPartitions(*cluster_by)
        .write.mode(mode)
        .parquet(path)
    )
