"""Round-6 batch 22: duplicate-family-size distribution and weekly
trend slopes.

Registered AFTER the round-6 grading window block (plans/__init__) —
new registrations must never perturb the first-50 window the driver
grades (pinned by tests/test_window_manifest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from project_fauna_spark.functions.moments import (
    int_pearson_moments,
    pearson_terms,
)
from project_fauna_spark.io import load_table
from project_fauna_spark.plans.registry import register

# --------------------------------------------------------------------------
# dedup_family_size_histogram — how big are the duplicate families?
# --------------------------------------------------------------------------


@register(
    "dedup_family_size_histogram",
    oracle="""
    WITH g AS (SELECT text, COUNT(*) AS sz FROM documents GROUP BY text)
    SELECT CAST(sz AS BIGINT) AS family_size,
           CAST(COUNT(*) AS BIGINT) AS n_families,
           CAST(sz * COUNT(*) AS BIGINT) AS n_docs,
           CAST((sz - 1) * COUNT(*) AS BIGINT) AS n_redundant
    FROM g GROUP BY sz
    """,
)
def dedup_family_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of EXACT-duplicate family sizes: how many text
    groups have 1, 2, 3… members, how many documents and how many
    redundant copies each size class holds — the shape that decides
    dedup strategy (a few giant families → hash-dedup wins big and
    cluster-representative choice matters; a long tail of pairs →
    near-dup detection is where the leverage is).  The size-resolved
    refinement of ``llm_dedup_survivorship_report``'s single
    exact-dedup line.

    Two map-combined hash aggregates (text → family size → histogram);
    the second runs on the family-count frame whose key domain is tiny
    (distinct sizes).  All counts exact.  Scale: the text-keyed
    aggregate is the same shape as exact dedup itself — at 100 TB key
    by a digest instead of raw text (the ``dedup_exact_text``
    convention) and nothing else changes.
    """
    g = (
        load_table(spark, sf_dir, "documents")
        .groupBy("text")
        .agg(F.count("*").alias("sz"))
    )
    return (
        g.groupBy("sz")
        .agg(F.count("*").alias("n_families"))
        .select(
            F.col("sz").cast("long").alias("family_size"),
            F.col("n_families").cast("long").alias("n_families"),
            (F.col("sz") * F.col("n_families")).cast("long").alias("n_docs"),
            ((F.col("sz") - F.lit(1)) * F.col("n_families"))
            .cast("long")
            .alias("n_redundant"),
        )
    )


# --------------------------------------------------------------------------
# ts_weekly_trend_slopes — is traffic ramping, week by week?
# --------------------------------------------------------------------------


@register(
    "ts_weekly_trend_slopes",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    wk AS (
      SELECT CAST(date_trunc('week', day) AS DATE) AS week_start,
             CAST(date_diff('day', CAST(date_trunc('week', day) AS DATE),
                            day) AS BIGINT) AS x,
             y
      FROM daily
    ),
    m AS (
      SELECT week_start,
             CAST(COUNT(*) AS HUGEINT) AS np,
             SUM(CAST(x AS HUGEINT)) AS sx,
             SUM(CAST(y AS HUGEINT)) AS sy,
             SUM(CAST(x AS HUGEINT) * y) AS sxy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx
      FROM wk GROUP BY week_start
    )
    SELECT week_start,
           CAST(np AS BIGINT) AS n_days,
           CAST(sy AS BIGINT) AS total_events,
           CAST(CAST(np * sxy - sx * sy AS VARCHAR) AS DOUBLE)
             / CAST(CAST(np * sxx - sx * sx AS VARCHAR) AS DOUBLE)
             AS slope_per_day
    FROM m
    WHERE np * sxx - sx * sx > 0
    """,
)
def ts_weekly_trend_slopes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-week OLS trend of the daily event count: for each calendar
    week (Monday start in both engines' ``date_trunc('week')``), the
    least-squares slope of count vs day-of-week — events/day of ramp,
    the week-granular "are we growing right now?" readout that one
    global regression (``ml_ols_fit``) or the seasonal profile
    (``ts_weekday_profile``) can't give.  Single-day weeks (no x
    variance) are excluded rather than divided by.

    x is the 0–6 day offset within the week and y the exact daily
    count, so the closed-form slope ``(nΣxy−ΣxΣy)/(nΣx²−(Σx)²)`` is
    ONE double division of exactly-accumulated integers (the shared
    ``functions/moments`` machinery — Σy doubles as the week's total
    for free).  Scale: one map-combined daily aggregate, then a
    weeks-sized frame.
    """
    daily = (
        load_table(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("day"))
        .groupBy("day")
        .agg(F.count("*").alias("y"))
    )
    week_start = F.to_date(F.date_trunc("week", F.col("day")))
    wk = daily.select(
        week_start.alias("week_start"),
        F.datediff(F.col("day"), week_start).cast("long").alias("x"),
        "y",
    )
    m = int_pearson_moments(wk, ["week_start"])
    num, dx, _, _ = pearson_terms()
    return (
        m.filter(dx > 0)
        .select(
            "week_start",
            F.col("np_l").cast("long").alias("n_days"),
            F.col("sy").cast("long").alias("total_events"),
            (num.cast("double") / dx.cast("double")).alias("slope_per_day"),
        )
    )
