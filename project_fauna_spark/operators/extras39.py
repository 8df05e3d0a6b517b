"""Round-6 batch 33: week-over-week mix-shift monitoring and
stream-silence gap auditing.

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
# event_mix_shift_tvd — did the traffic MIX change this week?
# --------------------------------------------------------------------------


@register(
    "event_mix_shift_tvd",
    oracle="""
    WITH wt AS (
      SELECT CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS week,
             event_type, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    n AS (SELECT week, CAST(SUM(c) AS BIGINT) AS nt FROM wt GROUP BY 1),
    pairs AS (
      SELECT week AS week_a, LEAD(week) OVER (ORDER BY week) AS week_b,
             nt AS na, LEAD(nt) OVER (ORDER BY week) AS nb
      FROM n
    ),
    spine AS (
      SELECT p.week_a, p.week_b, p.na, p.nb, t.event_type
      FROM pairs p CROSS JOIN (SELECT DISTINCT event_type FROM wt) t
      WHERE p.week_b IS NOT NULL
    ),
    d AS (
      SELECT s.week_a, s.week_b, s.na, s.nb, s.event_type,
             ABS(COALESCE(a.c, 0) * s.nb - COALESCE(b.c, 0) * s.na) AS num_t
      FROM spine s
      LEFT JOIN wt a ON a.week = s.week_a AND a.event_type = s.event_type
      LEFT JOIN wt b ON b.week = s.week_b AND b.event_type = s.event_type
    )
    SELECT week_a, week_b,
           CAST(CAST(SUM(num_t) AS BIGINT) AS DOUBLE)
             / CAST(2 * na * nb AS DOUBLE) AS mix_tvd,
           MAX(struct_pack(n := num_t, t := event_type)).t AS top_mover_type,
           CAST(MAX(struct_pack(n := num_t, t := event_type)).n AS DOUBLE)
             / CAST(na * nb AS DOUBLE) AS top_mover_share_diff
    FROM d GROUP BY week_a, week_b, na, nb
    """,
)
def event_mix_shift_tvd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week TRAFFIC-MIX drift: the exact total-variation
    distance between consecutive weeks' event-type distributions, plus
    the type that moved the most and by how many share points — the
    production mix-shift alarm ("purchases collapsed to 2 % of
    traffic") that a volume monitor like ``dq_control_chart`` cannot
    see because TOTAL volume may be flat
    (``dq_distribution_drift`` compares fixed corpus halves once; this
    is the rolling weekly pairwise monitor).

    Same log-free exactness as ``text_tvd_language_drift``:
    TVD = Σ|c_a·N_b − c_b·N_a| / (2·N_a·N_b) over the type spine —
    all-integer numerators, ONE division per pair; the top mover is a
    lexicographic struct argmax (deterministic ties).  Scale: ONE
    map-combined (week, type) aggregate over raw events; every
    subsequent frame is weeks×types-sized.
    """
    wt = cached(
        load_table(spark, sf_dir, "events")
        .select(
            F.to_date(F.date_trunc("week", F.to_date("ts"))).alias("week"),
            "event_type",
        )
        .groupBy("week", "event_type")
        .agg(F.count("*").alias("c"))
    )
    n = wt.groupBy("week").agg(F.sum("c").alias("nt"))
    ow = W.orderBy("week")
    pairs = n.select(
        F.col("week").alias("week_a"),
        F.lead("week").over(ow).alias("week_b"),
        F.col("nt").alias("na"),
        F.lead("nt").over(ow).alias("nb"),
    ).filter(F.col("week_b").isNotNull())
    spine = pairs.crossJoin(wt.select("event_type").distinct())
    a = wt.select(
        F.col("week").alias("wa"),
        F.col("event_type").alias("ta"),
        F.col("c").alias("ca"),
    )
    b = wt.select(
        F.col("week").alias("wb"),
        F.col("event_type").alias("tb"),
        F.col("c").alias("cb"),
    )
    d = (
        spine.join(
            a,
            (F.col("week_a") == F.col("wa")) & (F.col("event_type") == F.col("ta")),
            "left",
        )
        .join(
            b,
            (F.col("week_b") == F.col("wb")) & (F.col("event_type") == F.col("tb")),
            "left",
        )
        .select(
            "week_a",
            "week_b",
            "na",
            "nb",
            "event_type",
            F.abs(
                F.coalesce(F.col("ca"), F.lit(0)) * F.col("nb")
                - F.coalesce(F.col("cb"), F.lit(0)) * F.col("na")
            ).alias("num_t"),
        )
    )
    mover = F.max(F.struct(F.col("num_t").alias("n"), F.col("event_type").alias("t")))
    return (
        d.groupBy("week_a", "week_b", "na", "nb")
        .agg(
            F.sum("num_t").alias("s"),
            mover.alias("m"),
        )
        .select(
            "week_a",
            "week_b",
            (
                F.col("s").cast("long").cast("double")
                / (F.lit(2) * F.col("na") * F.col("nb")).cast("double")
            ).alias("mix_tvd"),
            F.col("m.t").alias("top_mover_type"),
            (
                F.col("m.n").cast("double")
                / (F.col("na") * F.col("nb")).cast("double")
            ).alias("top_mover_share_diff"),
        )
    )


# --------------------------------------------------------------------------
# ts_stream_gap_audit — how long did the firehose ever go silent?
# --------------------------------------------------------------------------

_HOUR_US = 3_600_000_000
_GAP_ALERT_US = 300_000_000  # 5 minutes


@register(
    "ts_stream_gap_audit",
    oracle=f"""
    WITH t AS (SELECT DISTINCT epoch_us(ts) AS us FROM events),
    g AS (
      SELECT us, LEAD(us) OVER (ORDER BY us) - us AS gap
      FROM t
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_distinct_ts,
             CAST(MAX(us) - MIN(us) AS BIGINT) AS span_us
      FROM t
    ),
    m AS (
      SELECT CAST(SUM(CASE WHEN gap > {_GAP_ALERT_US} THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_alert_gaps,
             CAST(MAX(gap) AS BIGINT) AS largest_gap_us
      FROM g WHERE gap IS NOT NULL
    )
    SELECT s.n_distinct_ts, s.span_us, m.n_alert_gaps, m.largest_gap_us,
           (SELECT CAST(MIN(us) AS BIGINT) FROM g
            WHERE gap = m.largest_gap_us) AS largest_gap_start_us
    FROM s, m
    """,
)
def ts_stream_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silence audit of the whole event stream: the longest gap
    between consecutive event timestamps (exact microseconds), where
    it starts, and how many gaps exceeded the 5-minute alert
    threshold — the "was ingestion ever down?" check
    (``ts_date_spine_gapfill`` finds silent DAYS per user; this finds
    minute-grain GLOBAL outages).

    The ``dq_sequence_gap_audit`` de-skew shape transplanted to time:
    distinct timestamps bucket by hour (range-preserving), LEAD runs
    inside each bucket, and cross-bucket seams come from the
    hour-summary table — no global sort ever touches row-sized data.
    The gap start is the join-back MIN over maximal gaps.  All exact
    integer microseconds.
    """
    t = cached(
        load_table(spark, sf_dir, "events")
        .select(F.unix_micros("ts").alias("us"))
        .distinct()
        .withColumn("bucket", (F.col("us") / _HOUR_US).cast("long"))
    )
    in_bucket = t.select(
        "us",
        (
            F.lead("us").over(W.partitionBy("bucket").orderBy("us")) - F.col("us")
        ).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    summary = t.groupBy("bucket").agg(
        F.min("us").alias("min_u"), F.max("us").alias("max_u")
    )
    seams = summary.select(
        F.col("max_u").alias("us"),
        (F.lead("min_u").over(W.orderBy("bucket")) - F.col("max_u")).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    gaps = cached(in_bucket.unionAll(seams))
    s = t.agg(
        F.count("*").alias("n_distinct_ts"),
        (F.max("us") - F.min("us")).alias("span_us"),
    )
    m = gaps.agg(
        F.sum(F.when(F.col("gap") > _GAP_ALERT_US, 1).otherwise(0)).alias(
            "n_alert_gaps"
        ),
        F.max("gap").alias("largest_gap_us"),
    )
    start = gaps.join(
        F.broadcast(m.select(F.col("largest_gap_us").alias("lg"))),
        F.col("gap") == F.col("lg"),
    ).agg(F.min("us").alias("largest_gap_start_us"))
    return s.crossJoin(m).crossJoin(start).select(
        "n_distinct_ts",
        "span_us",
        "n_alert_gaps",
        "largest_gap_us",
        "largest_gap_start_us",
    )
