"""Round-6 batch 24: peak-to-trough drawdown and the discount demand
curve.

Registered AFTER the round-6 grading window block (plans/__init__) —
new registrations must never perturb the first-50 window the driver
grades (pinned by tests/test_window_manifest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from project_fauna_spark.cache import cached
from project_fauna_spark.io import load_table
from project_fauna_spark.plans.registry import dsum, register, sql_dsum

# --------------------------------------------------------------------------
# ts_max_drawdown — worst peak-to-trough collapse of the daily series
# --------------------------------------------------------------------------


@register(
    "ts_max_drawdown",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    ),
    w AS (
      SELECT event_type, day,
             MAX(cnt) OVER (PARTITION BY event_type ORDER BY day
                            ROWS UNBOUNDED PRECEDING) - cnt AS dd
      FROM daily
    ),
    m AS (
      SELECT event_type, CAST(MAX(dd) AS BIGINT) AS max_drawdown,
             CAST(COUNT(*) AS BIGINT) AS n_days
      FROM w GROUP BY 1
    )
    SELECT m.event_type, m.n_days, m.max_drawdown,
           MIN(w.day) AS trough_day
    FROM m JOIN w ON w.event_type = m.event_type AND w.dd = m.max_drawdown
    GROUP BY 1, 2, 3
    """,
)
def ts_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of the daily event count per type: the largest
    gap between the running historical peak and the current day's
    volume, plus the (earliest) day it bottomed out — the
    peak-to-trough collapse metric finance applies to equity curves
    and ops dashboards apply to traffic ("how far below our best day
    did we ever fall, and when?").  ``ts_cusum_changepoint`` locates
    sustained level SHIFTS; drawdown measures worst-case regression
    from the peak — 0 for a series that only ever sets new highs.

    All-integer: running max of exact counts, drawdown = runmax − cnt,
    the trough is the min day achieving the max (join-back, no
    order-dependent argmax).  Scale: the window and join-back run on
    the calendar-bounded daily frame (days × types), after one
    map-combined aggregate over raw events — a per-key unbounded
    series would two-phase through ``functions/ranks.bucket_offsets``
    instead.
    """
    daily = (
        load_table(spark, sf_dir, "events")
        .select("event_type", F.to_date("ts").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count("*").alias("cnt"))
    )
    run = Window.partitionBy("event_type").orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w = cached(
        daily.select(
            "event_type",
            "day",
            (F.max("cnt").over(run) - F.col("cnt")).alias("dd"),
        )
    )
    m = w.groupBy("event_type").agg(
        F.max("dd").cast("long").alias("max_drawdown"),
        F.count("*").alias("n_days"),
    )
    # m derives from w, so disambiguate the join keys by renaming.
    m2 = m.withColumnRenamed("event_type", "et")
    return (
        w.join(
            F.broadcast(m2),
            (F.col("event_type") == F.col("et"))
            & (F.col("dd") == F.col("max_drawdown")),
        )
        .groupBy("et", "n_days", "max_drawdown")
        .agg(F.min("day").alias("trough_day"))
        .select(
            F.col("et").alias("event_type"),
            "n_days",
            "max_drawdown",
            "trough_day",
        )
    )


# --------------------------------------------------------------------------
# q_discount_demand_curve — does discounting actually move volume?
# --------------------------------------------------------------------------


@register(
    "q_discount_demand_curve",
    oracle=f"""
    SELECT CAST(ROUND(l_discount * 100) AS BIGINT) AS discount_pct,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*)
             AS avg_qty,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 30, 8)} AS revenue
    FROM lineitem
    GROUP BY 1
    """,
)
def q_discount_demand_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Demand curve across the discount ladder: for each discount
    level (0–10 %), line count, total and mean quantity, and the
    realized discounted revenue — the pricing-analytics readout that
    says whether deeper discounts buy bigger baskets
    (``q_promo_revenue`` measures promo share; this resolves volume
    response BY discount level).

    The discount bucket is ``round(l_discount·100)`` — both engines
    round the SAME stored double, so near-integer inputs bucket
    identically.  Quantities are integer-valued doubles cast to
    BIGINT (exact); ``avg_qty`` is one IEEE division of exact
    integers; revenue uses the decimal-accumulate convention
    (VARCHAR-routed in the oracle).  Scale: ONE map-combined
    aggregate over lineitem into an 11-key frame — no shuffle wider
    than the discount domain.
    """
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("long")
    return (
        li.groupBy(
            F.round(F.col("l_discount") * 100)
            .cast("long")
            .alias("discount_pct")
        )
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(qty).alias("total_qty"),
            (F.sum(qty).cast("double") / F.count("*")).alias("avg_qty"),
            dsum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
            ).alias("revenue"),
        )
    )
