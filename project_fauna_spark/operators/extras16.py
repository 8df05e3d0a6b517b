"""Round-6 batch 10: time-series autocorrelation and a feature-store
leakage audit.

Registered AFTER the round-6 grading window block (plans/__init__) —
new registrations must never perturb the first-50 window the driver
grades (pinned by tests/test_window_manifest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from project_fauna_spark.cache import cached
from project_fauna_spark.functions.moments import (
    int_pearson_moments,
    pearson_terms,
)
from project_fauna_spark.io import load_table
from project_fauna_spark.plans.registry import register, sql_davg, davg

# --------------------------------------------------------------------------
# ts_acf_daily — autocorrelation of the daily event count at small lags
# --------------------------------------------------------------------------

_ACF_LAGS = [1, 2, 3, 7]


@register(
    "ts_acf_daily",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    lags(lag) AS (VALUES {", ".join(f"({k})" for k in _ACF_LAGS)}),
    pairs AS (
      SELECT l.lag, a.n AS x, b.n AS y
      FROM lags l
      JOIN daily a ON TRUE
      JOIN daily b ON b.day = a.day + l.lag
    ),
    m AS (
      SELECT lag,
             CAST(COUNT(*) AS HUGEINT) AS np,
             SUM(CAST(x AS HUGEINT)) AS sx,
             SUM(CAST(y AS HUGEINT)) AS sy,
             SUM(CAST(x AS HUGEINT) * y) AS sxy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx,
             SUM(CAST(y AS HUGEINT) * y) AS syy
      FROM pairs GROUP BY lag
    )
    SELECT CAST(lag AS BIGINT) AS lag,
           CAST(np AS BIGINT) AS n_pairs,
           CAST(CAST(np * sxy - sx * sy AS VARCHAR) AS DOUBLE)
             / (sqrt(CAST(CAST(np * sxx - sx * sx AS VARCHAR) AS DOUBLE))
                * sqrt(CAST(CAST(np * syy - sy * sy AS VARCHAR) AS DOUBLE)))
             AS acf
    FROM m
    WHERE np * sxx - sx * sx > 0 AND np * syy - sy * sy > 0
    """,
)
def ts_acf_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily event count at lags 1/2/3/7 — the
    seasonality detector: a spike at lag 7 says weekly cycle, slow
    decay says trend, and the answer decides whether the forecast /
    anomaly operators need deseasonalizing first.

    Everything before the final division is EXACT integer arithmetic:
    daily counts are integers, each lag's Pearson moments (Σx, Σy,
    Σxy, Σx², Σy²) accumulate in decimal(38,0) (HUGEINT in the
    oracle), and the correlation is the classic
    ``(nΣxy−ΣxΣy) / (√(nΣx²−(Σx)²)·√(nΣy²−(Σy)²))`` with the three
    operands cast to double from the same exact integers on both
    engines — sqrt is IEEE-correctly-rounded (memory: sqrt-safe where
    pow is not).  Zero-variance lags are filtered, not divided.
    Scale: the daily series is calendar-bounded (one map-combined
    aggregate of the fact table), so the lag self-join and moment
    aggregates run on a tiny frame no matter the corpus size; missing
    days simply produce no pair (documented: ACF over observed pairs).
    """
    daily = cached(
        load_table(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("day"))
        .groupBy("day")
        .agg(F.count("*").alias("n"))
    )
    lags = spark.createDataFrame([(k,) for k in _ACF_LAGS], "lag int")
    a = daily.select(F.col("day").alias("a_day"), F.col("n").alias("x"))
    bset = daily.select(F.col("day").alias("b_day"), F.col("n").alias("y"))
    pairs = (
        F.broadcast(lags)
        .crossJoin(a)
        .withColumn("b_day", F.expr("date_add(a_day, lag)"))
        .join(bset, "b_day")
    )
    m = int_pearson_moments(pairs, ["lag"])
    _, dx, dy, corr = pearson_terms()
    return (
        m.filter((dx > 0) & (dy > 0))
        .select(
            F.col("lag").cast("long").alias("lag"),
            F.col("np_l").cast("long").alias("n_pairs"),
            corr.alias("acf"),
        )
    )


# --------------------------------------------------------------------------
# ml_leakage_naive_vs_asof — what a naive latest-feature join would leak
# --------------------------------------------------------------------------


@register(
    "ml_leakage_naive_vs_asof",
    oracle=f"""
    WITH anchors AS (
      SELECT event_id AS anchor_id, user_id, ts AS anchor_ts
      FROM events WHERE event_type = 'purchase'
    ),
    views AS (
      SELECT user_id, ts, event_id, value
      FROM events WHERE event_type = 'view'
    ),
    naive AS (
      SELECT user_id,
             MAX(struct_pack(t := ts, i := event_id, v := value)) AS nv
      FROM views GROUP BY user_id
    ),
    asof_sel AS (
      SELECT a.anchor_id,
             MAX(struct_pack(t := v.ts, i := v.event_id, v := v.value)) AS av
      FROM anchors a JOIN views v
        ON v.user_id = a.user_id
       AND v.ts < a.anchor_ts
       AND v.ts >= a.anchor_ts - INTERVAL 30 DAY
      GROUP BY a.anchor_id
    ),
    joined AS (
      SELECT a.anchor_id, a.anchor_ts,
             n.nv.t AS naive_ts, n.nv.v AS naive_v,
             s.av.v AS asof_v
      FROM anchors a
      LEFT JOIN naive n ON n.user_id = a.user_id
      LEFT JOIN asof_sel s ON s.anchor_id = a.anchor_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_anchors,
           CAST(COUNT(asof_v) AS BIGINT) AS n_with_prior,
           CAST(COUNT(CASE WHEN naive_ts >= anchor_ts THEN 1 END) AS BIGINT)
             AS n_leaky,
           CAST(COUNT(CASE WHEN naive_ts >= anchor_ts THEN 1 END) AS DOUBLE)
             / COUNT(*) AS leak_rate,
           {sql_davg('CASE WHEN asof_v IS NOT NULL THEN abs(naive_v - asof_v) END')}
             AS avg_abs_drift
    FROM joined
    """,
)
def ml_leakage_naive_vs_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-leakage audit: for every purchase anchor, compare the
    NAIVE feature join ("user's latest view, whenever it happened" —
    what a non-point-in-time feature store silently does) against the
    leakage-safe AS-OF join (latest view strictly before the anchor,
    30-day window, the ``ml_training_snapshot_asof`` discipline).
    Reports how many anchors the naive join poisons with future data
    (its chosen event is at/after the anchor) and the mean absolute
    feature drift between the two answers — the number that justifies
    paying for point-in-time-correct infrastructure.

    Both "latest" selections are deterministic struct-argmax over the
    unique (ts, event_id) key, identical in both engines.  Scale: the
    naive side is ONE user-keyed aggregate; the as-of side is the
    banded user-keyed join; the edge is a single map-combined summary
    row.  Drift is a per-row |difference| of doubles (IEEE-exact)
    under a decimal-accumulated mean.
    """
    e = load_table(spark, sf_dir, "events")
    # anchors feeds the as-of join AND the final left joins; views feeds
    # the naive aggregate AND the as-of join — persist both filtered
    # projections so the events scan runs once per side, not twice.
    anchors = cached(
        e.filter(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("anchor_id"),
            "user_id",
            F.col("ts").alias("anchor_ts"),
        )
    )
    views = cached(
        e.filter(F.col("event_type") == "view").select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
            F.col("event_id").alias("v_id"),
            F.col("value").alias("v_value"),
        )
    )
    naive = views.groupBy("v_user").agg(
        F.max(
            F.struct(
                F.col("v_ts").alias("t"),
                F.col("v_id").alias("i"),
                F.col("v_value").alias("v"),
            )
        ).alias("nv")
    )
    asof = (
        anchors.join(
            views,
            (F.col("v_user") == F.col("user_id"))
            & (F.col("v_ts") < F.col("anchor_ts"))
            & (F.col("v_ts") >= F.col("anchor_ts") - F.expr("INTERVAL 30 DAYS")),
        )
        .groupBy("anchor_id")
        .agg(
            F.max(
                F.struct(
                    F.col("v_ts").alias("t"),
                    F.col("v_id").alias("i"),
                    F.col("v_value").alias("v"),
                )
            ).alias("av")
        )
    )
    joined = (
        anchors.join(naive, anchors.user_id == naive.v_user, "left")
        .join(asof, "anchor_id", "left")
        .select(
            "anchor_ts",
            F.col("nv.t").alias("naive_ts"),
            F.col("nv.v").alias("naive_v"),
            F.col("av.v").alias("asof_v"),
        )
    )
    leaky = F.when(F.col("naive_ts") >= F.col("anchor_ts"), 1)
    return joined.agg(
        F.count("*").alias("n_anchors"),
        F.count("asof_v").alias("n_with_prior"),
        F.count(leaky).alias("n_leaky"),
        (F.count(leaky).cast("double") / F.count("*")).alias("leak_rate"),
        davg(
            F.when(
                F.col("asof_v").isNotNull(),
                F.abs(F.col("naive_v") - F.col("asof_v")),
            )
        ).alias("avg_abs_drift"),
    ).select(
        F.col("n_anchors").cast("long").alias("n_anchors"),
        F.col("n_with_prior").cast("long").alias("n_with_prior"),
        F.col("n_leaky").cast("long").alias("n_leaky"),
        "leak_rate",
        "avg_abs_drift",
    )
