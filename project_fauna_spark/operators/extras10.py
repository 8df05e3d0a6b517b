"""Round-6 batch 4: active-learning margin sampling and
control-chart (3-sigma) pipeline monitoring.

Registered AFTER the round-6 grading window block (plans/__init__) —
new registrations must never perturb the first-50 window the driver
grades (pinned by tests/test_window_manifest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from project_fauna_spark.io import load_table
from project_fauna_spark.operators._oracle_shared import SQL_COS
from project_fauna_spark.plans.registry import register

# --------------------------------------------------------------------------
# ml_active_learning_margin — most-uncertain vectors for labeling
# --------------------------------------------------------------------------

_AL_BOTTOM_K = 50


@register(
    "ml_active_learning_margin",
    oracle=f"""
    WITH x AS (
      SELECT label, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS v
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
    ),
    c AS (
      SELECT label, dim,
             CAST(CAST(SUM(CAST(CAST(v AS VARCHAR) AS DECIMAL(30,12))) AS VARCHAR) AS DOUBLE)
               / COUNT(*) AS m
      FROM x GROUP BY label, dim
    ),
    cent AS (
      SELECT label AS c_label, list(m ORDER BY dim) AS centroid
      FROM c GROUP BY label
    ),
    e AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
    ),
    sims AS (
      SELECT e.vec_id, e.label, cent.c_label,
             {SQL_COS.format(a="e.emb", b="cent.centroid")} AS cos,
             row_number() OVER (PARTITION BY e.vec_id
                                ORDER BY {SQL_COS.format(a="e.emb", b="cent.centroid")} DESC,
                                         cent.c_label) AS rn
      FROM e CROSS JOIN cent
    ),
    piv AS (
      SELECT vec_id, ANY_VALUE(label) AS label,
             MAX(CASE WHEN rn = 1 THEN c_label END) AS top_label,
             MAX(CASE WHEN rn = 1 THEN cos END) AS top_sim,
             MAX(CASE WHEN rn = 2 THEN cos END) AS second_sim
      FROM sims GROUP BY vec_id
    )
    SELECT vec_id, label, CAST(top_label AS INT) AS top_label,
           top_sim, second_sim,
           top_sim - second_sim AS margin
    FROM piv
    ORDER BY top_sim - second_sim, vec_id
    LIMIT {_AL_BOTTOM_K}
    """,
)
def ml_active_learning_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based active learning: the 50 vectors whose top-two
    label-centroid similarities are closest — the most uncertain
    points, i.e. the ones worth sending to human labelers / an LLM
    judge next.  The standard uncertainty-sampling loop for growing a
    classifier's training set at minimal labeling cost.

    Centroids use the decimal-accumulated per-dimension means
    (``sim_centroid_confusion`` convention — order-independent sums,
    VARCHAR-routed in the oracle); each vector scores against the
    broadcast |labels|-row centroid table with index-ordered cosine
    folds; the margin is one subtraction of two bit-identical doubles,
    and the bottom-K cut orders by (margin, vec_id) so ties are
    deterministic.  Scale: scoring is O(N·labels) narrow work; the
    global bottom-50 is a TakeOrdered, never a full sort.
    """
    from project_fauna_spark.functions.vectors import cosine_sim

    e = load_table(spark, sf_dir, "embeddings")
    x = e.select(
        "label",
        F.posexplode(F.transform("embedding", lambda v: v.cast("double"))).alias(
            "dim", "v"
        ),
    )
    c = x.groupBy("label", "dim").agg(
        (F.sum(F.col("v").cast("decimal(30,12)")).cast("double") / F.count("v")).alias(
            "m"
        )
    )
    cent = c.groupBy(F.col("label").alias("c_label")).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "m"))), lambda s: s.m
        ).alias("centroid")
    )
    ev = e.select(
        "vec_id",
        "label",
        F.transform("embedding", lambda v: v.cast("double")).alias("emb"),
    )
    sims = ev.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "label",
        "c_label",
        cosine_sim(F.col("emb"), F.col("centroid")).alias("cos"),
    )
    w = W.partitionBy("vec_id").orderBy(F.col("cos").desc(), "c_label")
    piv = (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .groupBy("vec_id")
        .agg(
            F.any_value("label").alias("label"),
            F.max(F.when(F.col("rn") == 1, F.col("c_label"))).alias("top_label"),
            F.max(F.when(F.col("rn") == 1, F.col("cos"))).alias("top_sim"),
            F.max(F.when(F.col("rn") == 2, F.col("cos"))).alias("second_sim"),
        )
    )
    margin = F.col("top_sim") - F.col("second_sim")
    return (
        piv.select(
            "vec_id",
            "label",
            F.col("top_label").cast("int").alias("top_label"),
            "top_sim",
            "second_sim",
            margin.alias("margin"),
        )
        .orderBy("margin", "vec_id")
        .limit(_AL_BOTTOM_K)
    )


# --------------------------------------------------------------------------
# dq_control_chart — Shewhart 3-sigma monitoring of daily volumes
# --------------------------------------------------------------------------


@register(
    "dq_control_chart",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             COUNT(*) AS n
      FROM events GROUP BY event_type, CAST(date_trunc('day', ts) AS DATE)
    ),
    stats AS (
      SELECT event_type,
             COUNT(*) AS nd,
             SUM(n) AS s1,
             SUM(n * n) AS s2
      FROM daily GROUP BY event_type
    ),
    lim AS (
      SELECT event_type,
             CAST(s1 AS DOUBLE) / nd AS mean_n,
             sqrt(CAST(nd * s2 - s1 * s1 AS DOUBLE)
                  / (nd * (nd - 1))) AS sigma_n
      FROM stats WHERE nd > 1
    )
    SELECT d.event_type, strftime(d.day, '%Y-%m-%d') AS day,
           CAST(d.n AS BIGINT) AS n_events,
           l.mean_n + (3.0 * l.sigma_n) AS ucl,
           l.mean_n - (3.0 * l.sigma_n) AS lcl,
           (CAST(d.n AS DOUBLE) > l.mean_n + (3.0 * l.sigma_n))
             OR (CAST(d.n AS DOUBLE) < l.mean_n - (3.0 * l.sigma_n))
             AS out_of_control
    FROM daily d JOIN lim l ON l.event_type = d.event_type
    """,
)
def dq_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shewhart control chart over daily event volumes: per event
    type, flag days outside mean ± 3σ — the pipeline-health monitor
    every ingestion SLA dashboard runs (sudden volume drops/spikes are
    the first symptom of an upstream break).

    Parity: daily counts are exact integers; the sample variance is
    the all-integer form (N·Σn² − (Σn)²)/(N(N−1)) — one division —
    and σ is ONE ``sqrt`` (IEEE correctly-rounded, the only libm-safe
    function per the repo's float rules); limits are the fixed
    expression mean ± (3.0·σ), so both engines compute bit-identical
    bounds and the boolean can never straddle.  At very large daily
    counts (n > ~3·10⁹) Σn² needs the decimal route; at any realistic
    per-day volume BIGINT holds exactly.

    Scale: two map-combined aggregates (events → daily, daily →
    stats) and one broadcast join back — the stats table is
    |event_types| rows.
    """
    e = load_table(spark, sf_dir, "events").select("event_type", "ts")
    daily = e.groupBy(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.count("*").alias("n"))
    stats = daily.groupBy("event_type").agg(
        F.count("*").alias("nd"),
        F.sum("n").alias("s1"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
    )
    lim = stats.filter(F.col("nd") > 1).select(
        "event_type",
        (F.col("s1").cast("double") / F.col("nd")).alias("mean_n"),
        F.sqrt(
            (F.col("nd") * F.col("s2") - F.col("s1") * F.col("s1")).cast("double")
            / (F.col("nd") * (F.col("nd") - 1))
        ).alias("sigma_n"),
    )
    ucl = F.col("mean_n") + (F.lit(3.0) * F.col("sigma_n"))
    lcl = F.col("mean_n") - (F.lit(3.0) * F.col("sigma_n"))
    n_d = F.col("n").cast("double")
    return daily.join(F.broadcast(lim), "event_type").select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("n").cast("long").alias("n_events"),
        ucl.alias("ucl"),
        lcl.alias("lcl"),
        ((n_d > ucl) | (n_d < lcl)).alias("out_of_control"),
    )
