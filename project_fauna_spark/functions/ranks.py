"""Two-phase (bucketed) rank/cumsum decomposition — THE de-skew
primitive this engine uses wherever a running sum, sequence number, or
order statistic would otherwise need a window partitioned by a
low-cardinality key (a whole-group single-task funnel at 100 TB).

Shape: (1) rows get a LOCAL rank/cumsum within (partition keys,
bucket) sub-windows; (2) this helper builds the TINY per-bucket totals
table (one row per bucket) whose own cumulative window yields each
bucket's starting offset; (3) the caller broadcast-joins the offsets
back and adds.  Sums/ranks are exact integers, so the decomposition
reproduces the single-window spelling bit-for-bit (every oracle uses
the single-window form).

Lives in functions/ (non-registering) per the repo convention — five
operators share it: llm_pack_shards, llm_microbatch_padding,
event_time_to_convert, agg_approx_percentile_bound,
agg_weighted_median.  tests/test_plan_quality pins the resulting plan
shape (raw-data windows always carry their bucket key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def bucket_offsets(
    df: DataFrame,
    part_cols: list[str],
    bucket_col: str,
    value: Column,
    total_alias: str = "part_total",
) -> DataFrame:
    """Per-(partition, bucket) starting offsets for a two-phase
    rank/cumsum.

    Returns one row per (part_cols…, bucket_col) with:

    * ``offset`` — the sum of ``value`` over all EARLIER buckets of the
      same partition (0 for the first bucket), and
    * ``total_alias`` — the partition-wide total of ``value``.

    ``value`` is summed exactly (pass ``F.lit(1)`` for row counts /
    plain ranks, a weight column for weighted ranks, a measure column
    for cumsums).  The windows here run over the AGGREGATED bucket
    table — bucket-count rows per partition — so partitioning by the
    bare key is bounded and safe, unlike on the raw data.
    """
    w_off = (
        W.partitionBy(*part_cols).orderBy(bucket_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    return (
        df.groupBy(*part_cols, bucket_col)
        .agg(F.sum(value).alias("_bucket_total"))
        .select(
            *part_cols,
            bucket_col,
            F.coalesce(F.sum("_bucket_total").over(w_off), F.lit(0)).alias("offset"),
            F.sum("_bucket_total")
            .over(W.partitionBy(*part_cols))
            .alias(total_alias),
        )
    )
