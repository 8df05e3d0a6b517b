"""Round-6 batch 27: KMV distinct-count sketch and systematic
hash-order sampling.

Registered AFTER the round-6 grading window block (plans/__init__) —
new registrations must never perturb the first-50 window the driver
grades (pinned by tests/test_window_manifest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from project_fauna_spark.cache import cached
from project_fauna_spark.functions.ranks import bucket_offsets
from project_fauna_spark.io import load_table
from project_fauna_spark.plans.registry import register

# --------------------------------------------------------------------------
# sketch_kmv_distinct — bottom-k minimum values distinct estimator
# --------------------------------------------------------------------------

_KMV_K = 64
_H32_RANGE = 1 << 32


def _kmv_oracle() -> str:
    from project_fauna_spark.operators._oracle_shared import sql_h32 as _sql_h32

    hv = _sql_h32("CAST(l_partkey AS VARCHAR)", "kmv:")
    return f"""
    WITH u AS (SELECT DISTINCT l_partkey FROM lineitem),
    h AS (SELECT DISTINCT {hv} AS hv FROM u),
    bot AS (SELECT hv FROM h ORDER BY hv LIMIT {_KMV_K}),
    a AS (SELECT CAST(COUNT(*) AS BIGINT) AS k_used,
                 CAST(MAX(hv) AS BIGINT) AS kth_hash
          FROM bot),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_exact FROM u)
    SELECT n_exact, k_used, kth_hash, estimate,
           estimate / n_exact - 1 AS rel_error
    FROM (
      SELECT n.n_exact, a.k_used, a.kth_hash,
             CASE WHEN a.k_used < {_KMV_K} THEN CAST(n.n_exact AS DOUBLE)
                  ELSE CAST((a.k_used - 1) * {_H32_RANGE} AS DOUBLE)
                       / CAST(a.kth_hash + 1 AS DOUBLE)
             END AS estimate
      FROM n, a
    )
    """


@register("sketch_kmv_distinct", oracle_builder=_kmv_oracle)
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values / bottom-k) distinct-count sketch over
    the parts referenced by lineitem, judged against the exact count:
    hash every key with the portable 32-bit salted md5 fold, keep the
    k = 64 smallest DISTINCT hash values, and estimate
    |D| ≈ (k−1)/u_(k) where u_(k) is the k-th smallest hash mapped to
    (0, 1] — the mergeable cardinality sketch that predates HLL
    (``agg_hll_sketch_merge`` covers Spark's native HLL; KMV is the
    one whose estimate an oracle can REPLAY exactly, because the
    bottom-k of a deterministic hash is itself deterministic).

    The estimate is one IEEE division of exact integers:
    (k−1)·2³² / (h_(k)+1).  Fewer than k distinct hashes → the sketch
    degenerates to the exact count (standard KMV behavior).  Scale:
    the bottom-k is a TakeOrdered (per-partition top-k, then a k-sized
    merge at the driver-side of the exchange — never a global sort),
    over hashes deduped map-side; the sketch state is k integers no
    matter how many keys stream through, and two sketches merge by
    taking the bottom-k of their union.
    """
    from project_fauna_spark.functions.wordhash import h32 as _h32

    u = cached(
        load_table(spark, sf_dir, "lineitem").select("l_partkey").distinct()
    )
    h = u.select(
        _h32(F.col("l_partkey").cast("string"), "kmv:").alias("hv")
    ).distinct()
    bot = h.orderBy("hv").limit(_KMV_K)
    a = bot.agg(
        F.count("*").alias("k_used"), F.max("hv").alias("kth_hash")
    )
    n = u.agg(F.count("*").alias("n_exact"))
    est = F.when(
        F.col("k_used") < _KMV_K, F.col("n_exact").cast("double")
    ).otherwise(
        ((F.col("k_used") - 1) * F.lit(_H32_RANGE)).cast("double")
        / (F.col("kth_hash") + 1).cast("double")
    )
    return (
        n.crossJoin(a)
        .select("n_exact", "k_used", "kth_hash", est.alias("estimate"))
        .select(
            "n_exact",
            "k_used",
            "kth_hash",
            "estimate",
            (F.col("estimate") / F.col("n_exact") - 1).alias("rel_error"),
        )
    )


# --------------------------------------------------------------------------
# sample_systematic_stride — every Nth row in hash order
# --------------------------------------------------------------------------

_STRIDE = 100
_SYS_BUCKETS_SHIFT = 24  # bucket = h >> 24: 256 range-ordered buckets


def _systematic_oracle() -> str:
    from project_fauna_spark.operators._oracle_shared import sql_h32 as _sql_h32

    hv = _sql_h32("CAST(o_orderkey AS VARCHAR)", "sys:")
    return f"""
    WITH h AS (SELECT o_orderkey, {hv} AS hv FROM orders),
    r AS (
      SELECT o_orderkey, hv,
             row_number() OVER (ORDER BY hv, o_orderkey) AS rnk
      FROM h
    )
    SELECT CAST(rnk AS BIGINT) AS sample_rank, o_orderkey, hv AS hash_key
    FROM r WHERE (rnk - 1) % {_STRIDE} = 0
    """


@register("sample_systematic_stride", oracle_builder=_systematic_oracle)
def sample_systematic_stride(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic 1-in-100 sample in PORTABLE hash order: rank every
    order by its salted 32-bit md5 hash (ties broken by key) and keep
    ranks 1, 101, 201, … — the evenly-spaced deterministic sample that
    (unlike ``sample_bernoulli``) has EXACTLY ⌈n/100⌉ rows and zero
    clumping, and (unlike ``sample_reservoir_hash``) preserves a
    reproducible global ordering any engine can replay.

    The global rank never funnels: rows bucket by the hash's top 8
    bits (range-ordered, so bucket boundaries respect the sort),
    rank locally within their bucket, and add broadcast per-bucket
    offsets from ``functions/ranks.bucket_offsets`` — the oracle uses
    the equivalent single-window spelling.  Scale: the only wide
    exchange is the 256-way bucket shuffle; the offsets table is 256
    rows.
    """
    from project_fauna_spark.functions.wordhash import h32 as _h32

    h = cached(
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            _h32(F.col("o_orderkey").cast("string"), "sys:").alias("hv"),
        )
        .withColumn("bucket", F.shiftright(F.col("hv"), _SYS_BUCKETS_SHIFT))
    )
    local = F.row_number().over(
        W.partitionBy("bucket").orderBy("hv", "o_orderkey")
    )
    ranked = h.select("o_orderkey", "hv", "bucket", local.alias("lrnk"))
    offs = bucket_offsets(h, [], "bucket", F.lit(1))
    return (
        ranked.join(F.broadcast(offs.select("bucket", "offset")), "bucket")
        .select(
            (F.col("offset") + F.col("lrnk")).alias("sample_rank"),
            "o_orderkey",
            F.col("hv").alias("hash_key"),
        )
        .filter((F.col("sample_rank") - 1) % _STRIDE == 0)
    )
