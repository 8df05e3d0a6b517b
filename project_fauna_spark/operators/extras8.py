"""Round-6 batch 2 (tail): calendar date-spine gap-fill.

This module held five round-6 operators; the four graded green in
round 7 (``dedup_paragraph_hash``, ``sim_matryoshka_prefix_recall``,
``sim_ivf_nprobe_sweep``, ``layout_zone_map_pruning``) moved to their
thematic homes (dedup.py / similarity.py / layout.py) at the round-8
rotation — the same moved-home convention as the round-7 regrade seats
— so the one never-graded entry here can head the round-8 window
without the graded four re-occupying seats.

Scale note (100 TB): ``ts_date_spine_gapfill`` is the calendar-spine
generation pattern (sequence + explode): the spine is bounded by each
user's own span, so the explode never exceeds rows × max-span.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from project_fauna_spark.cache import cached
from project_fauna_spark.io import load_table
from project_fauna_spark.plans.registry import register

# --------------------------------------------------------------------------
# ts_date_spine_gapfill — calendar-spine generation + activity coverage
# --------------------------------------------------------------------------


@register(
    "ts_date_spine_gapfill",
    oracle="""
    WITH act AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events GROUP BY user_id, CAST(date_trunc('day', ts) AS DATE)
    ),
    span AS (
      SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM act GROUP BY user_id
    ),
    spine AS (
      SELECT user_id,
             CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                         CAST(d1 AS TIMESTAMP),
                                         INTERVAL 1 DAY)) AS DATE) AS day
      FROM span
    ),
    j AS (
      SELECT s.user_id, s.day, a.user_id IS NOT NULL AS active
      FROM spine s LEFT JOIN act a
        ON a.user_id = s.user_id AND a.day = s.day
    )
    SELECT user_id,
           COUNT(*) AS n_days_span,
           CAST(COUNT(*) FILTER (WHERE active) AS BIGINT) AS n_active_days,
           CAST(COUNT(*) FILTER (WHERE NOT active) AS BIGINT) AS n_gap_days,
           CAST(COUNT(*) FILTER (WHERE active) AS DOUBLE) / COUNT(*)
             AS activity_ratio,
           strftime(MIN(CASE WHEN NOT active THEN day END), '%Y-%m-%d')
             AS first_gap_day
    FROM j GROUP BY user_id
    """,
)
def ts_date_spine_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-spine gap-fill: generate each user's full daily date
    spine between their first and last event (``sequence`` + explode —
    the densification pattern every reporting pipeline needs before
    window math can see zero-activity days), left-join actual activity,
    and report coverage plus the first silent day.

    The spine explode is bounded per user by their own span (never a
    global calendar cross join); activity is pre-aggregated to
    (user, day) before the join, so the spine join is id+date equi.
    Counts are integers; the ratio is one division; the gap day is a
    formatted date string (no timestamp-type edge).
    """
    e = load_table(spark, sf_dir, "events").select("user_id", "ts")
    act = e.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).distinct()
    act = cached(act)
    span = act.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = span.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    j = spine.join(
        act.withColumn("active", F.lit(True)), ["user_id", "day"], "left"
    ).withColumn("active", F.coalesce(F.col("active"), F.lit(False)))
    return j.groupBy("user_id").agg(
        F.count("*").alias("n_days_span"),
        F.sum(F.col("active").cast("long")).cast("long").alias("n_active_days"),
        F.sum((~F.col("active")).cast("long")).cast("long").alias("n_gap_days"),
        (
            F.sum(F.col("active").cast("long")).cast("double") / F.count("*")
        ).alias("activity_ratio"),
        F.date_format(
            F.min(F.when(~F.col("active"), F.col("day"))), "yyyy-MM-dd"
        ).alias("first_gap_day"),
    )
