"""Round-6 batch 7: temporal interval algebra (session×error overlap
via island merging) and exact time-decayed leaderboards.

Registered AFTER the round-6 grading window block (plans/__init__) —
new registrations must never perturb the first-50 window the driver
grades (pinned by tests/test_window_manifest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from project_fauna_spark.cache import cached
from project_fauna_spark.io import load_table
from project_fauna_spark.plans.registry import register

_SESSION_GAP_US = 1800 * 1_000_000  # 30-min session gap
_ERROR_WINDOW_US = 300 * 1_000_000  # each error taints a 5-min window


@register(
    "event_session_error_overlap",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM events
    ),
    marked AS (
      SELECT user_id, us, event_id,
             CASE WHEN lag(us) OVER w IS NULL
                  OR us - lag(us) OVER w > {_SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS new_sess
      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ),
    sess AS (
      SELECT user_id,
             MIN(us) AS s_start, MAX(us) AS s_end
      FROM (SELECT user_id, us,
                   SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS sess_id
            FROM marked)
      GROUP BY user_id, sess_id
    ),
    err AS (
      SELECT user_id, us AS e_start, us + {_ERROR_WINDOW_US} AS e_end, event_id
      FROM ev WHERE event_type = 'error'
    ),
    emark AS (
      SELECT user_id, e_start, e_end, event_id,
             CASE WHEN COALESCE(MAX(e_end) OVER (
                    PARTITION BY user_id ORDER BY e_start, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                  >= e_start THEN 0 ELSE 1 END AS new_island
      FROM err
    ),
    island AS (
      SELECT user_id, MIN(e_start) AS i_start, MAX(e_end) AS i_end
      FROM (SELECT user_id, e_start, e_end,
                   SUM(new_island) OVER (PARTITION BY user_id
                                         ORDER BY e_start, event_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS island_id
            FROM emark)
      GROUP BY user_id, island_id
    ),
    ov AS (
      SELECT s.user_id,
             GREATEST(0, LEAST(s.s_end, i.i_end) - GREATEST(s.s_start, i.i_start))
               AS ov_us
      FROM sess s JOIN island i
        ON i.user_id = s.user_id
       AND i.i_start <= s.s_end AND s.s_start <= i.i_end
    ),
    per_user AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_overlaps,
             CAST(SUM(ov_us) AS BIGINT) AS overlap_us
      FROM ov WHERE ov_us > 0 GROUP BY user_id
    ),
    base AS (
      SELECT s.user_id,
             COUNT(*) AS n_sessions,
             (SELECT COUNT(*) FROM island i WHERE i.user_id = s.user_id)
               AS n_error_islands
      FROM sess s GROUP BY s.user_id
    )
    SELECT b.user_id,
           CAST(b.n_sessions AS BIGINT) AS n_sessions,
           CAST(b.n_error_islands AS BIGINT) AS n_error_islands,
           CAST(COALESCE(p.n_overlaps, 0) AS BIGINT) AS n_overlaps,
           CAST(COALESCE(p.overlap_us, 0) AS DOUBLE) / 1000000.0
             AS overlap_seconds
    FROM base b LEFT JOIN per_user p ON p.user_id = b.user_id
    """,
)
def event_session_error_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal interval algebra: per user, the total time their
    sessions were 'tainted' by an error window — sessions become
    [first, last] intervals (30-min gap rule), each error event taints
    a 5-minute window, overlapping error windows are UNION-merged into
    islands (so the total never double-counts), and session×island
    intersections are summed.  The SLA/billing/attribution primitive
    the pairwise ``join_interval_overlap`` detection op doesn't give.

    Island merging is the gaps-islands running-max trick (a window over
    the user-keyed error stream: a new island starts where e_start
    exceeds the max end seen so far) — integer µs end-to-end; islands
    are DISJOINT by construction so the per-session sum equals the
    interval-union overlap.  The intersection join is equi on user_id
    with a band predicate; the one double division is at the edge.
    Scale: all windows key on user_id (high-cardinality); island and
    session tables are strictly smaller than the event table.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us"), "event_id"
    )
    ev = cached(ev)
    w_u = W.partitionBy("user_id").orderBy("us", "event_id")
    new_sess = F.when(
        F.lag("us").over(w_u).isNull()
        | (F.col("us") - F.lag("us").over(w_u) > _SESSION_GAP_US),
        1,
    ).otherwise(0)
    sess = (
        ev.withColumn("new_sess", new_sess)
        .withColumn(
            "sess_id",
            F.sum("new_sess").over(w_u.rowsBetween(W.unboundedPreceding, W.currentRow)),
        )
        .groupBy("user_id", "sess_id")
        .agg(F.min("us").alias("s_start"), F.max("us").alias("s_end"))
    )
    err = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("us").alias("e_start"),
        (F.col("us") + F.lit(_ERROR_WINDOW_US)).alias("e_end"),
        "event_id",
    )
    w_e = W.partitionBy("user_id").orderBy("e_start", "event_id")
    prev_max_end = F.max("e_end").over(w_e.rowsBetween(W.unboundedPreceding, -1))
    emark = err.withColumn(
        "new_island",
        F.when(F.coalesce(prev_max_end, F.lit(-1)) >= F.col("e_start"), 0).otherwise(1),
    )
    island = (
        # event_id tie-break: under tied e_start the cumsum's row order
        # must match the new_island flags' order or two OVERLAPPING
        # islands can emerge (code-review r6 — every running window in
        # this repo carries a unique tie-break key).
        emark.withColumn(
            "island_id",
            F.sum("new_island").over(
                W.partitionBy("user_id").orderBy("e_start", "event_id")
                .rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
        )
        .groupBy("user_id", "island_id")
        .agg(F.min("e_start").alias("i_start"), F.max("e_end").alias("i_end"))
    )
    island = cached(island)
    ov_us = F.greatest(
        F.lit(0),
        F.least(F.col("s_end"), F.col("i_end"))
        - F.greatest(F.col("s_start"), F.col("i_start")),
    )
    ov = (
        sess.join(
            island.withColumnRenamed("user_id", "i_user"),
            (F.col("i_user") == F.col("user_id"))
            & (F.col("i_start") <= F.col("s_end"))
            & (F.col("s_start") <= F.col("i_end")),
        )
        .select("user_id", ov_us.alias("ov_us"))
        .filter(F.col("ov_us") > 0)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_overlaps"),
            F.sum("ov_us").alias("overlap_us"),
        )
    )
    n_islands = island.groupBy("user_id").agg(
        F.count("*").alias("n_error_islands")
    )
    base = (
        sess.groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"))
        .join(n_islands, "user_id", "left")
        .withColumn("n_error_islands", F.coalesce("n_error_islands", F.lit(0)))
    )
    return base.join(ov, "user_id", "left").select(
        "user_id",
        F.col("n_sessions").cast("long").alias("n_sessions"),
        F.col("n_error_islands").cast("long").alias("n_error_islands"),
        F.coalesce("n_overlaps", F.lit(0)).cast("long").alias("n_overlaps"),
        (F.coalesce("overlap_us", F.lit(0)).cast("double") / 1000000.0).alias(
            "overlap_seconds"
        ),
    )


# --------------------------------------------------------------------------
# event_decayed_leaderboard — exact dyadic time-decayed counts
# --------------------------------------------------------------------------

# 2^-30 tail.  The cap bounds the fractional bits each dyadic term
# carries (30), so partial sums stay EXACTLY representable while the
# group's decayed score is below 2^(53-30) = 2^23 ≈ 8.4M — comfortable
# headroom for per-(type, user) daily counts at any graded scale (a cap
# of 40 would round at scores ≥ 8192; code-review r6).
_DECAY_CAP_DAYS = 30
_LEADER_TOPK = 3


@register(
    "event_decayed_leaderboard",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             COUNT(*) AS c
      FROM events GROUP BY 1, 2, 3
    ),
    anchored AS (
      SELECT event_type, user_id, c,
             LEAST(date_diff('day', day, (SELECT MAX(CAST(date_trunc('day', ts) AS DATE)) FROM events)),
                   {_DECAY_CAP_DAYS}) AS age
      FROM daily
    ),
    scored AS (
      SELECT event_type, user_id,
             CAST(SUM(c) AS BIGINT) AS raw_count,
             SUM(CAST(c AS DOUBLE) / (CAST(1 AS BIGINT) << age)) AS decayed_score
      FROM anchored GROUP BY event_type, user_id
    )
    SELECT event_type, user_id, raw_count, decayed_score, rnk FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY event_type
                                        ORDER BY decayed_score DESC, user_id)
                     AS INT) AS rnk
      FROM scored) WHERE rnk <= {_LEADER_TOPK}
    """,
)
def event_decayed_leaderboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decayed leaderboard: top-3 users per event type by
    exponentially decayed daily counts (half-life = 1 day) — recency-
    weighted ranking without windowed recomputation, the counters
    pattern behind trending/engagement scores.

    EXACT decay without libm: the weight 2^-age is spelled
    ``c / (1 << age)`` — an integer power of two built by bit-shift,
    then ONE division whose result is exactly representable (dyadic),
    so the cross-row SUM is order-independent and bit-identical across
    engines (the ``ts_ewma_bounded`` powers-of-two trick applied to
    calendar decay; ``pow(0.5, k)`` would walk through libm and is
    banned at compared edges).  Ages cap at {_DECAY_CAP_DAYS}: each
    term then carries ≤ {_DECAY_CAP_DAYS} fractional bits, so sums are
    exact (hence order-independent) while a group's score stays below
    2^(53-{_DECAY_CAP_DAYS}) ≈ 8.4M — the bound that makes the
    bit-identical claim true, not just likely.

    Scale: one map-combined daily aggregate, a broadcast 1-row anchor
    (global max day), a per-(type, user) aggregate, and a top-k window
    over the small scored table.
    """
    e = load_table(spark, sf_dir, "events").select("event_type", "user_id", "ts")
    daily = e.groupBy(
        "event_type", "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.count("*").alias("c"))
    anchor = e.agg(F.max(F.to_date(F.date_trunc("day", "ts"))).alias("max_day"))
    anchored = daily.crossJoin(F.broadcast(anchor)).select(
        "event_type",
        "user_id",
        "c",
        F.least(F.datediff("max_day", "day"), F.lit(_DECAY_CAP_DAYS)).alias("age"),
    )
    scored = anchored.groupBy("event_type", "user_id").agg(
        F.sum("c").cast("long").alias("raw_count"),
        F.sum(
            F.col("c").cast("double") / F.expr("shiftleft(CAST(1 AS BIGINT), age)")
        ).alias("decayed_score"),
    )
    w = W.partitionBy("event_type").orderBy(F.col("decayed_score").desc(), "user_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= _LEADER_TOPK)
        .select("event_type", "user_id", "raw_count", "decayed_score", "rnk")
    )
