"""Round-6 batch 11: survival analysis (Kaplan–Meier churn curve) and
an exact two-sample Kolmogorov–Smirnov distribution test.

Registered AFTER the round-6 grading window block (plans/__init__) —
new registrations must never perturb the first-50 window the driver
grades (pinned by tests/test_window_manifest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from project_fauna_spark.cache import cached
from project_fauna_spark.functions.ranks import bucket_offsets_multi
from project_fauna_spark.io import load_table
from project_fauna_spark.plans.registry import register

# --------------------------------------------------------------------------
# event_survival_km — Kaplan–Meier time-to-churn with right-censoring
# --------------------------------------------------------------------------

_KM_HORIZON_HOURS = 24
_US_PER_HOUR = 3_600_000_000


@register(
    "event_survival_km",
    oracle=f"""
    WITH RECURSIVE fv AS (
      SELECT user_id, MIN(ts) AS fts FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    fp AS (
      SELECT e.user_id, MIN(e.ts) AS pts
      FROM events e JOIN fv ON fv.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= fv.fts
      GROUP BY e.user_id
    ),
    ee AS (SELECT MAX(ts) AS endts FROM events),
    du AS (
      SELECT CASE WHEN lat_h IS NOT NULL AND lat_h <= obs_h
                  THEN lat_h ELSE obs_h END AS t,
             CASE WHEN lat_h IS NOT NULL AND lat_h <= obs_h
                  THEN 1 ELSE 0 END AS churned
      FROM (
        SELECT (epoch_us(fp.pts) - epoch_us(fv.fts)) // {_US_PER_HOUR}
                 AS lat_h,
               LEAST({_KM_HORIZON_HOURS},
                     (epoch_us(ee.endts) - epoch_us(fv.fts))
                       // {_US_PER_HOUR}) AS obs_h
        FROM fv LEFT JOIN fp ON fp.user_id = fv.user_id CROSS JOIN ee
      )
    ),
    per_t AS (
      SELECT t, CAST(SUM(churned) AS BIGINT) AS d,
             CAST(SUM(1 - churned) AS BIGINT) AS c
      FROM du GROUP BY t
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM du),
    risk AS (
      SELECT t, d, c,
             tot.n - CAST(COALESCE(SUM(d + c) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS n_risk
      FROM per_t CROSS JOIN tot
    ),
    ev AS (
      SELECT t, d, c, n_risk,
             1.0 - CAST(d AS DOUBLE) / n_risk AS factor,
             ROW_NUMBER() OVER (ORDER BY t) AS i
      FROM risk WHERE d > 0
    ),
    s(i, surv) AS (
      SELECT i, factor FROM ev WHERE i = 1
      UNION ALL
      SELECT ev.i, s.surv * ev.factor FROM s JOIN ev ON ev.i = s.i + 1
    )
    SELECT CAST(ev.t AS BIGINT) AS t_hours,
           ev.n_risk,
           ev.d AS n_converted,
           ev.c AS n_censored_at,
           CAST(ev.d AS DOUBLE) / ev.n_risk AS hazard,
           s.surv AS survival
    FROM ev JOIN s ON s.i = ev.i
    """,
)
def event_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier curve of view→purchase conversion latency under a
    24-hour observation horizon, with RIGHT-CENSORING done properly: a
    viewer who hasn't converted by the horizon (or whose first view
    sits closer than the horizon to the end of the data) is censored
    at their observed bound, not dropped and not counted as a
    non-event — the estimator that de-biases "median time to convert"
    when observation windows are ragged, which naive latency
    percentiles (``event_time_to_convert``) cannot do.

    S(t) = Π_{{s≤t}} (1 − d_s/n_s) over conversion hours s.  The
    per-user reduction is two keyed aggregates + one equi join;
    everything after lives on the HOUR-DISTINCT frame (≤ horizon+1
    rows — tiny at any scale), so the at-risk suffix counts and the
    ordered product are bounded windows/folds, not data-sized state.
    The cumulative product is the index-ordered fold convention: Spark
    folds a sorted factor array left-to-right (``F.aggregate``), the
    oracle replays the IDENTICAL multiply order via a recursive CTE —
    same sequence of IEEE doubles, bit-equal survival values.
    Durations are exact integer hours (µs integer division).
    """
    e = load_table(spark, sf_dir, "events")
    # fv feeds the purchase join AND the left join below — persist so
    # the events scan + user-keyed MIN runs once (the
    # event_conversion_window_sweep convention).
    fv = cached(
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("fts"))
    )
    fp = (
        e.filter(F.col("event_type") == "purchase")
        .join(fv, "user_id")
        .filter(F.col("ts") >= F.col("fts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("pts"))
    )
    endts = e.agg(F.max("ts").alias("endts"))
    lat_h = F.expr(
        f"(unix_micros(pts) - unix_micros(fts)) div {_US_PER_HOUR}"
    )
    obs_h = F.least(
        F.lit(_KM_HORIZON_HOURS),
        F.expr(f"(unix_micros(endts) - unix_micros(fts)) div {_US_PER_HOUR}"),
    )
    converted = lat_h.isNotNull() & (lat_h <= obs_h)
    du = (
        fv.join(fp, "user_id", "left")
        .crossJoin(F.broadcast(endts))
        .select(
            F.when(converted, lat_h).otherwise(obs_h).alias("t"),
            F.when(converted, 1).otherwise(0).alias("churned"),
        )
    )
    per_t = du.groupBy("t").agg(
        F.sum("churned").cast("long").alias("d"),
        F.sum(F.lit(1) - F.col("churned")).cast("long").alias("c"),
    )
    tot = du.agg(F.count("*").alias("n"))
    w_prev = W.partitionBy().orderBy("t").rowsBetween(W.unboundedPreceding, -1)
    # per_t is duration-distinct (≤ calendar days): the bare-key window
    # and the fold below run on a bounded frame, never on raw data.
    risk = per_t.crossJoin(F.broadcast(tot)).select(
        "t",
        "d",
        "c",
        (
            F.col("n")
            - F.coalesce(
                F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0)
            )
        )
        .cast("long")
        .alias("n_risk"),
    )
    ev = risk.filter(F.col("d") > 0).withColumn(
        "factor", F.lit(1.0) - F.col("d").cast("double") / F.col("n_risk")
    )
    arr = ev.agg(
        F.sort_array(
            F.collect_list(F.struct("t", "d", "c", "n_risk", "factor"))
        ).alias("fs")
    )
    expl = arr.select(F.posexplode("fs").alias("idx", "s"), F.col("fs"))
    surv = F.aggregate(
        F.slice(F.col("fs"), 1, F.col("idx") + 1),
        F.lit(1.0),
        lambda acc, x: acc * x.factor,
    )
    return expl.select(
        F.col("s.t").cast("long").alias("t_hours"),
        F.col("s.n_risk").alias("n_risk"),
        F.col("s.d").alias("n_converted"),
        F.col("s.c").alias("n_censored_at"),
        (F.col("s.d").cast("double") / F.col("s.n_risk")).alias("hazard"),
        surv.alias("survival"),
    )


# --------------------------------------------------------------------------
# dq_ks_two_sample — exact Kolmogorov–Smirnov distance between groups
# --------------------------------------------------------------------------


@register(
    "dq_ks_two_sample",
    oracle="""
    WITH v AS (
      SELECT l_extendedprice AS x,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS g
      FROM lineitem WHERE l_returnflag IN ('A', 'R')
    ),
    d AS (
      SELECT x, CAST(SUM(g) AS BIGINT) AS n1,
             CAST(SUM(1 - g) AS BIGINT) AS n0
      FROM v GROUP BY x
    ),
    t AS (SELECT CAST(SUM(n1) AS BIGINT) AS t1,
                 CAST(SUM(n0) AS BIGINT) AS t0 FROM d),
    c AS (
      SELECT x,
             SUM(n1) OVER (ORDER BY x) AS c1,
             SUM(n0) OVER (ORDER BY x) AS c0
      FROM d
    ),
    diffs AS (
      SELECT x,
             ABS(CAST(c1 AS DOUBLE) / t.t1 - CAST(c0 AS DOUBLE) / t.t0)
               AS df
      FROM c CROSS JOIN t
    )
    SELECT t.t0 AS n_a, t.t1 AS n_r,
           MAX(struct_pack(d := df, nx := -x)).d AS ks_stat,
           -MAX(struct_pack(d := df, nx := -x)).nx AS ks_at_value
    FROM diffs CROSS JOIN t
    GROUP BY t.t0, t.t1
    """,
)
def dq_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic between the
    ``l_extendedprice`` distributions of returned ('R') and
    acknowledged ('A') line items: D = max_x |F_R(x) − F_A(x)| with
    the value where the gap peaks — the standard distribution-shift
    detector, complementing ``dq_distribution_drift``'s binned
    chi-square with a bin-free exact answer.

    The empirical CDFs are cumulative counts over the DISTINCT-value
    frame, run two-phase (bucket-local cumsums over floor(x/4096)
    buckets + ONE broadcast ``bucket_offsets_multi`` pass covering both
    groups — never a global sort window on raw data).  Counts stay
    integers
    until the two CDF divisions; the argmax ties break to the smallest
    x via a struct max over (gap, −x) in both engines.  Scale: one
    value-keyed aggregate + tiny broadcasts.
    """
    v = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag").isin("A", "R"))
        .select(
            F.col("l_extendedprice").alias("x"),
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("g"),
        )
    )
    dist = cached(
        v.groupBy("x")
        .agg(
            F.sum("g").cast("long").alias("n1"),
            F.sum(F.lit(1) - F.col("g")).cast("long").alias("n0"),
        )
        .withColumn("bkt", F.floor(F.col("x") / F.lit(4096.0)).cast("long"))
    )
    # Both CDFs' offsets come from ONE aggregate pass over the cached
    # distinct-value frame (not one bucket_offsets call per group).
    offs = bucket_offsets_multi(
        dist,
        [],
        "bkt",
        [(F.col("n1"), "offset1", "t1"), (F.col("n0"), "offset0", "t0")],
    )
    w_loc = (
        W.partitionBy("bkt").orderBy("x").rowsBetween(W.unboundedPreceding, 0)
    )
    c = (
        dist.join(F.broadcast(offs), "bkt")
        .select(
            "x",
            "t1",
            "t0",
            (F.col("offset1") + F.sum("n1").over(w_loc)).alias("c1"),
            (F.col("offset0") + F.sum("n0").over(w_loc)).alias("c0"),
        )
    )
    df_col = F.abs(
        F.col("c1").cast("double") / F.col("t1")
        - F.col("c0").cast("double") / F.col("t0")
    )
    best = F.max(F.struct(df_col.alias("d"), (-F.col("x")).alias("nx")))
    return c.groupBy("t1", "t0").agg(
        best.getField("d").alias("ks_stat"),
        (-best.getField("nx")).alias("ks_at_value"),
    ).select(
        F.col("t0").cast("long").alias("n_a"),
        F.col("t1").cast("long").alias("n_r"),
        "ks_stat",
        "ks_at_value",
    )
