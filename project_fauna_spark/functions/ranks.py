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

Lives in functions/ (non-registering) per the repo convention — shared
by llm_pack_shards, llm_microbatch_padding, event_time_to_convert,
agg_approx_percentile_bound, agg_weighted_median,
agg_winsorized_trimmed_mean, and (via the multi-measure variant)
dq_ks_two_sample.  tests/test_plan_quality pins the resulting plan
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
    bucket_total_alias: str | None = None,
) -> DataFrame:
    """Per-(partition, bucket) starting offsets for a two-phase
    rank/cumsum.

    Returns one row per (part_cols…, bucket_col) with:

    * ``offset`` — the sum of ``value`` over all EARLIER buckets of the
      same partition (0 for the first bucket),
    * ``total_alias`` — the partition-wide total of ``value``, and
    * optionally ``bucket_total_alias`` — THIS bucket's own total,
      which the aggregate already computes; exposing it saves callers a
      second full groupBy over the raw data just to recover counts.

    ``value`` is summed exactly (pass ``F.lit(1)`` for row counts /
    plain ranks, a weight column for weighted ranks, a measure column
    for cumsums).  The windows here run over the AGGREGATED bucket
    table — bucket-count rows per partition — so partitioning by the
    bare key is bounded and safe, unlike on the raw data.
    """
    cols = [(value, "offset", total_alias)]
    out = _bucket_offsets_agg(df, part_cols, bucket_col, cols)
    if bucket_total_alias is not None:
        return out.withColumnRenamed("_bt_0", bucket_total_alias)
    return out.drop("_bt_0")


def bucket_offsets_multi(
    df: DataFrame,
    part_cols: list[str],
    bucket_col: str,
    values: list[tuple[Column, str, str]],
) -> DataFrame:
    """``bucket_offsets`` for SEVERAL measures in ONE aggregate pass.

    ``values`` is a list of ``(value, offset_alias, total_alias)``
    triples; each gets its own prefix-sum offset and partition-wide
    total column.  One groupBy + one pair of tiny-table windows instead
    of one full pass per measure — use when two-phase cumsums over the
    same bucketed frame are needed for more than one measure (e.g. the
    two empirical CDFs of a KS test).
    """
    return _bucket_offsets_agg(df, part_cols, bucket_col, values).drop(
        *[f"_bt_{i}" for i in range(len(values))]
    )


def _bucket_offsets_agg(
    df: DataFrame,
    part_cols: list[str],
    bucket_col: str,
    values: list[tuple[Column, str, str]],
) -> DataFrame:
    w_off = (
        W.partitionBy(*part_cols).orderBy(bucket_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    w_all = W.partitionBy(*part_cols)
    aggs = [F.sum(v).alias(f"_bt_{i}") for i, (v, _, _) in enumerate(values)]
    sel: list = [*part_cols, bucket_col]
    for i, (_, off_alias, tot_alias) in enumerate(values):
        sel.append(
            F.coalesce(F.sum(f"_bt_{i}").over(w_off), F.lit(0)).alias(off_alias)
        )
        sel.append(F.sum(f"_bt_{i}").over(w_all).alias(tot_alias))
        sel.append(F.col(f"_bt_{i}"))
    return df.groupBy(*part_cols, bucket_col).agg(*aggs).select(*sel)
