"""Round-6 batch 28: weekly growth accounting and key-sequence gap
auditing.

Registered AFTER the round-6 grading window block (plans/__init__) —
new registrations must never perturb the first-50 window the driver
grades (pinned by tests/test_window_manifest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from project_fauna_spark.cache import cached
from project_fauna_spark.io import load_table
from project_fauna_spark.plans.registry import register

# --------------------------------------------------------------------------
# event_growth_accounting — new / retained / resurrected / churned
# --------------------------------------------------------------------------


@register(
    "event_growth_accounting",
    oracle="""
    WITH uw AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS week
      FROM events
    ),
    c AS (
      SELECT user_id, week,
             LAG(week) OVER (PARTITION BY user_id ORDER BY week) AS prev
      FROM uw
    ),
    agg AS (
      SELECT week,
             CAST(COUNT(*) AS BIGINT) AS n_active,
             CAST(SUM(CASE WHEN prev IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_new,
             CAST(SUM(CASE WHEN prev = week - 7 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_retained,
             CAST(SUM(CASE WHEN prev IS NOT NULL AND prev < week - 7
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
      FROM c GROUP BY week
    )
    SELECT week, n_active, n_new, n_retained, n_resurrected,
           LAG(n_active) OVER (ORDER BY week) - n_retained AS n_churned,
           CASE WHEN LAG(n_active) OVER (ORDER BY week) - n_retained > 0
                THEN CAST(n_new + n_resurrected AS DOUBLE)
                     / CAST(LAG(n_active) OVER (ORDER BY week) - n_retained
                            AS DOUBLE)
           END AS quick_ratio
    FROM agg
    """,
)
def event_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly growth accounting (the Social-Capital framework): every
    active user each week is exactly one of NEW (first week ever),
    RETAINED (also active the week before) or RESURRECTED (active
    before, but not last week); CHURNED is last week's actives minus
    this week's retained, and the quick ratio (new + resurrected) /
    churned says whether growth outruns leakage.
    ``event_new_vs_returning`` splits daily actives two ways; this is
    the full four-state weekly ledger with conservation guarantees
    (new+retained+resurrected = active; churned closes the balance).

    One distinct (user, week) pass, one user-keyed window for
    first-week/previous-week, then a weeks-sized aggregate; the final
    churn lag runs on the tiny weekly frame.  All counts exact; the
    quick ratio is ONE IEEE division of exact integers, NULL when
    nobody churned.  Weeks with a gap in the calendar are handled by
    VALUE comparison (prev = week − 7 days), never by row adjacency.
    """
    uw = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.to_date(F.date_trunc("week", F.to_date("ts"))).alias("week"),
        )
        .distinct()
    )
    c = uw.select(
        "user_id",
        "week",
        F.lag("week").over(W.partitionBy("user_id").orderBy("week")).alias("prev"),
    )
    agg = c.groupBy("week").agg(
        F.count("*").alias("n_active"),
        F.sum(F.when(F.col("prev").isNull(), 1).otherwise(0)).alias("n_new"),
        F.sum(
            F.when(F.col("prev") == F.date_sub(F.col("week"), 7), 1).otherwise(0)
        ).alias("n_retained"),
        F.sum(
            F.when(
                F.col("prev").isNotNull()
                & (F.col("prev") < F.date_sub(F.col("week"), 7)),
                1,
            ).otherwise(0)
        ).alias("n_resurrected"),
    )
    churned = F.lag("n_active").over(W.orderBy("week")) - F.col("n_retained")
    return agg.select(
        "week",
        "n_active",
        "n_new",
        "n_retained",
        "n_resurrected",
        churned.alias("n_churned"),
        F.when(
            churned > 0,
            (F.col("n_new") + F.col("n_resurrected")).cast("double")
            / churned.cast("double"),
        ).alias("quick_ratio"),
    )


# --------------------------------------------------------------------------
# dq_sequence_gap_audit — holes in a key sequence, without a global sort
# --------------------------------------------------------------------------

_GAP_BUCKET = 1024  # fixed key-range width: bucket = key // 1024


@register(
    "dq_sequence_gap_audit",
    oracle=f"""
    WITH k AS (SELECT DISTINCT l_orderkey AS key FROM lineitem),
    g AS (
      SELECT key, LEAD(key) OVER (ORDER BY key) - key AS gap
      FROM k
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(MIN(key) AS BIGINT) AS min_key,
             CAST(MAX(key) AS BIGINT) AS max_key
      FROM k
    ),
    m AS (
      SELECT CAST(SUM(CASE WHEN gap > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_gap_runs,
             CAST(MAX(gap) AS BIGINT) AS largest_gap
      FROM g WHERE gap IS NOT NULL
    )
    SELECT s.n_keys, s.min_key, s.max_key,
           s.max_key - s.min_key + 1 - s.n_keys AS n_missing,
           m.n_gap_runs, m.largest_gap,
           (SELECT MIN(key) FROM g WHERE gap = m.largest_gap)
             AS largest_gap_start
    FROM s, m
    """,
)
def dq_sequence_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holes in the order-key sequence as seen from lineitem: how many
    ids in [min, max] never shipped a line, how many contiguous
    missing runs there are, and where the largest hole starts — the
    "did the upstream extractor drop a range?" audit that catches
    partition-sized losses a row count never would
    (``dq_referential_orphans`` checks the OTHER direction: children
    without parents).

    The adjacent-difference never globally sorts: keys bucket by
    ``key // 1024`` (range-preserving), LEAD runs within each bucket,
    and the cross-bucket seams come from a bucket-summary table
    (min/max per non-empty bucket — 1000× reduced before its own tiny
    window).  The largest-gap START is the min key achieving the max
    (join-back, order-independent).  All integers; the oracle is the
    single-window spelling.
    """
    k = cached(
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("key"))
        .distinct()
        .withColumn("bucket", (F.col("key") / _GAP_BUCKET).cast("long"))
    )
    in_bucket = k.select(
        "key",
        (
            F.lead("key").over(W.partitionBy("bucket").orderBy("key"))
            - F.col("key")
        ).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    summary = k.groupBy("bucket").agg(
        F.min("key").alias("min_k"), F.max("key").alias("max_k")
    )
    seams = summary.select(
        F.col("max_k").alias("key"),
        (
            F.lead("min_k").over(W.orderBy("bucket")) - F.col("max_k")
        ).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    gaps = cached(in_bucket.unionAll(seams))
    s = k.agg(
        F.count("*").alias("n_keys"),
        F.min("key").alias("min_key"),
        F.max("key").alias("max_key"),
    )
    m = gaps.agg(
        F.sum(F.when(F.col("gap") > 1, 1).otherwise(0)).alias("n_gap_runs"),
        F.max("gap").alias("largest_gap"),
    )
    start = (
        gaps.join(
            F.broadcast(m.select(F.col("largest_gap").alias("lg"))),
            F.col("gap") == F.col("lg"),
        )
        .agg(F.min("key").alias("largest_gap_start"))
    )
    return (
        s.crossJoin(m)
        .crossJoin(start)
        .select(
            "n_keys",
            "min_key",
            "max_key",
            (F.col("max_key") - F.col("min_key") + 1 - F.col("n_keys")).alias(
                "n_missing"
            ),
            "n_gap_runs",
            "largest_gap",
            "largest_gap_start",
        )
    )
