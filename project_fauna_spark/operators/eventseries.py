"""Event-series analytics over the ``events`` table.

Product-analytics shapes a clickstream warehouse runs daily: ordered
funnels, cohort retention, step-transition frequencies, and
A-then-B-within-Δt pattern detection.  All are expressed as staged
aggregations + windows on the ``user_id`` partitioning key — the one
natural shuffle key for event data.

Scale design (100 TB):

* Every operator shuffles at most twice on ``user_id`` (or an
  aggregate thereof); no all-pairs, no driver loops.  Per-user event
  counts are bounded in practice (fan-out skew on a hot user is AQE
  skew-join territory, not a plan change).
* Funnel stages are successive *aggregate-then-join* reductions:
  stage N+1 only scans the stage-N survivors — monotonically shrinking
  intermediates, never a per-event window over the whole stream.
* The within-Δt pattern join is an equi-join on user_id with the time
  band evaluated inside the join — bounded by the user key, never a
  global interval product.
* Tie-breaks: all orderings use ``(ts, event_id)`` — event_id is
  unique, so lead/lag and "first" are engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from project_fauna_spark.cache import cached
from project_fauna_spark.io import load_table
from project_fauna_spark.operators._oracle_shared import SQL_TS_FMT_US, TS_FMT_US, _fmt_ts
from project_fauna_spark.plans.registry import register


@register(
    "event_funnel_stages",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS v_ts FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS c_ts
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.v_ts
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS p_ts
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
      GROUP BY e.user_id
    )
    SELECT '1_view' AS stage, COUNT(*) AS n_users FROM v
    UNION ALL SELECT '2_click', COUNT(*) FROM c
    UNION ALL SELECT '3_purchase', COUNT(*) FROM p
    """,
)
def event_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: view → later click → later purchase, per user.

    Each stage is an aggregate-then-join reduction over the previous
    stage's survivors (users-with-first-ts, one row per user) — the
    intermediate shrinks monotonically, so stage depth adds joins on
    an already-tiny side, not passes over the raw events."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    # v and c feed two union branches each — persist the (one row per
    # user) stage outputs so the claimed one-pass-per-stage shape holds
    # even without runtime exchange reuse.
    v, c = cached(v), cached(c)
    count_of = lambda df, name: df.agg(F.count("*").alias("n_users")).select(
        F.lit(name).alias("stage"), "n_users"
    )
    return (
        count_of(v, "1_view")
        .unionAll(count_of(c, "2_click"))
        .unionAll(count_of(p, "3_purchase"))
    )


@register(
    "event_retention_cohort",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, CAST(MIN(ts) AS DATE) AS cohort_day FROM events GROUP BY user_id
    )
    SELECT strftime(date_trunc('week', f.cohort_day), '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) // 7 AS INT) AS week_offset,
           COUNT(DISTINCT e.user_id) AS active_users
    FROM events e JOIN first_seen f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def event_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen week, counted as
    active per whole-week offset from their personal first day.

    Two shuffles: the per-user MIN (map-combined) and the final
    distinct count on (cohort_week, offset).  The join back to events
    is an equi-join on user_id — co-partitioned with the first
    aggregate, so AQE reuses the exchange."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts")
    first_seen = e.groupBy("user_id").agg(F.min("ts").cast("date").alias("cohort_day"))
    return (
        e.join(first_seen, "user_id")
        .select(
            F.date_format(F.date_trunc("week", "cohort_day"), "yyyy-MM-dd").alias(
                "cohort_week"
            ),
            F.floor(
                F.datediff(F.col("ts").cast("date"), F.col("cohort_day")) / 7
            ).cast("int").alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


@register(
    "event_type_transitions",
    oracle="""
    WITH seq AS (
      SELECT event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    )
    SELECT event_type, next_type, COUNT(*) AS n
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
)
def event_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Step-transition bigram counts: (event_type → next event_type)
    per user timeline, the Markov-chain view of a clickstream.

    One window shuffle on user_id (lead over (ts, event_id) — unique
    tie-break) and one map-combined count aggregation."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_id", "event_type", "ts")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count("*").alias("n"))
    )


@register(
    "event_error_follows_purchase",
    oracle="""
    WITH flagged AS (
      SELECT DISTINCT p.event_id
      FROM events p JOIN events x
        ON x.user_id = p.user_id
       AND x.event_type = 'error'
       AND x.ts > p.ts AND x.ts <= p.ts + INTERVAL 1 HOUR
      WHERE p.event_type = 'purchase'
    )
    SELECT p.user_id,
           COUNT(*) AS n_purchases,
           COUNT(f.event_id) AS n_with_error_1h
    FROM events p LEFT JOIN flagged f ON p.event_id = f.event_id
    WHERE p.event_type = 'purchase'
    GROUP BY p.user_id
    """,
)
def event_error_follows_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-then-B-within-Δt pattern: purchases followed by an error
    within 1 hour for the same user; per-user totals.

    The pattern probe is a left-semi self-join: equi-key user_id
    bounds the pairing (never a global interval product), the 1-hour
    band evaluates inside the join.  At 100 TB the same plan holds —
    both sides shuffle once on user_id; a per-user sort-merge handles
    the band."""
    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    x = (
        e.filter(F.col("event_type") == "error")
        .select(F.col("user_id").alias("x_user"), F.col("ts").alias("x_ts"))
    )
    flagged = p.join(
        x,
        (p.user_id == F.col("x_user"))
        & (F.col("x_ts") > p.ts)
        & (F.col("x_ts") <= p.ts + F.expr("INTERVAL 1 HOUR")),
        "left_semi",
    ).select("event_id")
    return (
        p.join(flagged.withColumn("hit", F.lit(1)), "event_id", "left")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_purchases"),
            F.count("hit").alias("n_with_error_1h"),
        )
    )


@register(
    "event_sessionize_lag_cumsum",
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER w <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts, event_id,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
      FROM gaps
    )
    SELECT user_id, CAST(session_no AS INT) AS session_no,
           COUNT(*) AS n_events,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end
    FROM sess GROUP BY user_id, session_no
    """,
)
def event_sessionize_lag_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization, lag+cumsum spelling: a session breaks when
    the gap to the previous event exceeds 30 minutes; session ids are
    the running count of breaks.

    The classic two-window formulation (vs ``stream_session_window``'s
    session-window operator): BOTH windows share one (user_id) shuffle
    and one (ts, event_id) sort — Catalyst reuses the exchange, so
    sessionizing any volume costs a single ordered pass per key."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # Microsecond-exact gap test (cast-to-long truncates to seconds and
    # can disagree with the oracle's INTERVAL comparison at the edge).
    gap_break = (
        F.when(
            F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
            <= 1800 * 1_000_000,
            F.lit(0),
        ).otherwise(F.lit(1))
    )
    sess = e.withColumn("new_session", gap_break).withColumn(
        "session_no",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)).cast("int"),
    )
    return sess.groupBy("user_id", "session_no").agg(
        F.count("*").alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
    )


@register(
    "event_last_touch_attribution",
    oracle="""
    WITH w AS (
      SELECT user_id, event_id, ts, event_type,
             last_value(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
               OVER uw AS touch_ts,
             last_value(CASE WHEN event_type = 'view' THEN event_id END IGNORE NULLS)
               OVER uw AS touch_event_id
      FROM events
      WINDOW uw AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, event_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
           CASE WHEN touch_ts IS NOT NULL
                 AND epoch_us(ts) - epoch_us(touch_ts) <= 604800000000
                THEN touch_event_id END AS touch_event_id,
           CASE WHEN touch_ts IS NOT NULL
                 AND epoch_us(ts) - epoch_us(touch_ts) <= 604800000000
                THEN epoch_us(ts) - epoch_us(touch_ts) END AS touch_lag_us,
           (touch_ts IS NOT NULL
            AND epoch_us(ts) - epoch_us(touch_ts) <= 604800000000) AS attributed
    FROM w
    WHERE event_type = 'purchase'
    """,
)
def event_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the most recent
    strictly-earlier 'view' by the same user within a 7-day window.

    The conditional ``last(..., ignorenulls=True)`` over an unbounded
    preceding frame is the same single-exchange shape as the as-of
    join (`relational.join_asof_latest_order`) — no self-join, no
    range explosion; state per row is the running last-view tuple.
    """
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    uw = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    is_view = F.col("event_type") == "view"
    touch_ts = F.last(F.when(is_view, F.col("ts")), ignorenulls=True).over(uw)
    touch_id = F.last(F.when(is_view, F.col("event_id")), ignorenulls=True).over(uw)
    x = e.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        touch_ts.alias("touch_ts"),
        touch_id.alias("raw_touch_event_id"),
    ).filter(F.col("event_type") == "purchase")
    lag_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("touch_ts"))
    in_window = F.col("touch_ts").isNotNull() & (lag_us <= 604800000000)
    return x.select(
        "user_id",
        "event_id",
        _fmt_ts("ts", TS_FMT_US).alias("ts"),
        F.when(in_window, F.col("raw_touch_event_id")).alias("touch_event_id"),
        F.when(in_window, lag_us).alias("touch_lag_us"),
        in_window.alias("attributed"),
    )


@register(
    "event_path_to_purchase",
    oracle="""
    WITH p AS (
      SELECT user_id, event_id, event_type,
             coalesce(array_to_string(list(event_type) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING), '>'), '') AS path
      FROM events
    )
    SELECT path, COUNT(*) AS n_purchases
    FROM p WHERE event_type = 'purchase'
    GROUP BY path
    ORDER BY n_purchases DESC, path
    LIMIT 20
    """,
)
def event_path_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top conversion paths: the ordered 3-event prefix preceding each
    purchase, ranked by frequency — the path-analysis staple of
    product analytics.

    One user_id exchange for the window, then a map-combined count on
    the path string; top-20 is ``TakeOrderedAndProject``.  Empty
    prefixes (a user's first event is a purchase) normalize to ''
    on both engines.
    """
    e = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, -1)
    )
    p = e.select(
        "event_type",
        F.concat_ws(">", F.collect_list("event_type").over(w)).alias("path"),
    ).filter(F.col("event_type") == "purchase")
    return (
        p.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_purchases"))
        .orderBy(F.col("n_purchases").desc(), "path")
        .limit(20)
    )


def _distributed_ntile(df: DataFrame, order_cols, n_buckets: int, out_col: str) -> DataFrame:
    """Exact NTILE(n_buckets) with no single-partition global window.

    Range-repartition on the sort key (partition i's keys all precede
    partition i+1's — sampling-based boundaries, balance independent of
    key skew), take ``row_number`` within each range partition, rebuild
    the global rank by adding each partition's starting offset (tiny
    per-partition counts, triangular broadcast self-join — no global
    window, so no ``WindowExec: No Partition Defined`` stage anywhere),
    then apply the SQL NTILE bucket formula to (rank, total): the first
    ``n % k`` buckets take ``n div k + 1`` rows, the rest ``n div k``.
    Bit-identical to the engine ntile because the trailing unique
    tie-break column makes the global order total.
    """
    ranged = df.repartitionByRange(*order_cols).withColumn("_pid", F.spark_partition_id())
    w_local = W.partitionBy("_pid").orderBy(*order_cols)
    # `local` feeds TWO branches (per-partition count grid + final rank
    # join), and event_rfm_segmentation CHAINS three of these — uncached,
    # each stage re-derived its whole upstream per branch (2^3 blowup:
    # 364 Exchanges / 122 BNLJ in the initial plan, tools/audit_plans.py
    # r12).  One pin per stage caps the recompute at one pass per stage
    # (r12; guide §5 persist-on-reuse).
    local = cached(ranged.withColumn("_lrn", F.row_number().over(w_local).cast("long")))
    counts = local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_c"))
    prior = counts.select(F.col("_pid").alias("_pid2"), F.col("_c").alias("_c2"))
    offsets = (
        counts.join(F.broadcast(prior), F.col("_pid2") < F.col("_pid"), "left")
        .groupBy("_pid")
        .agg(F.coalesce(F.sum("_c2"), F.lit(0)).alias("_off"))
    )
    total = counts.agg(F.sum("_c").alias("_n"))
    rn = F.col("_lrn") + F.col("_off")
    n, k = F.col("_n"), F.lit(n_buckets)
    q = F.floor(n / k)
    r = n % k
    cutoff = r * (q + 1)
    bucket = F.when(rn <= cutoff, F.ceil(rn / (q + 1))).otherwise(
        r + F.ceil((rn - cutoff) / F.greatest(q, F.lit(1)))
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .crossJoin(F.broadcast(total))
        .withColumn(out_col, bucket.cast("long"))
        .drop("_pid", "_lrn", "_off", "_n")
    )


@register(
    "event_rfm_segmentation",
    oracle="""
    WITH p AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
    ),
    agg AS (
      SELECT user_id,
             MAX(ts) AS last_ts,
             COUNT(*) AS frequency,
             CAST(CAST(SUM(CAST(CAST(value AS VARCHAR) AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE)
               AS monetary
      FROM p GROUP BY user_id
    ),
    ref AS (SELECT MAX(ts) AS ref_ts FROM p),
    scored AS (
      SELECT a.user_id,
             (epoch_us(r.ref_ts) - epoch_us(a.last_ts)) // 86400000000
               AS recency_days,
             a.frequency, a.monetary,
             CAST(ntile(5) OVER (ORDER BY a.last_ts DESC, a.user_id) AS BIGINT) AS r_score,
             CAST(ntile(5) OVER (ORDER BY a.frequency DESC, a.user_id) AS BIGINT) AS f_score,
             CAST(ntile(5) OVER (ORDER BY a.monetary DESC, a.user_id) AS BIGINT) AS m_score
      FROM agg a, ref r
    )
    SELECT user_id, recency_days, frequency, monetary,
           r_score, f_score, m_score,
           CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
             || CAST(m_score AS VARCHAR) AS segment
    FROM scored
    """,
)
def event_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-user recency / frequency / monetary with
    quintile scores and a 3-digit segment label — the marketing
    composed query, decimal-exact and tie-broken for determinism.

    The reference timestamp is a 1-row aggregate cross-joined in
    (broadcast, no collect).  Each quintile score is an exact
    distributed NTILE (:func:`_distributed_ntile`): range-shuffled
    rank reconstruction instead of the textbook single-partition
    global ntile window — the per-user table is keyspace-sized, and a
    100 TB keyspace must not funnel through one task.
    """
    p = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    agg = p.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("value").cast("decimal(30,8)")).cast("double").alias("monetary"),
    )
    ref = p.agg(F.max("ts").alias("ref_ts"))
    j = agg.crossJoin(F.broadcast(ref))
    j = _distributed_ntile(j, [F.col("last_ts").desc(), F.col("user_id")], 5, "r_score")
    j = _distributed_ntile(j, [F.col("frequency").desc(), F.col("user_id")], 5, "f_score")
    j = _distributed_ntile(j, [F.col("monetary").desc(), F.col("user_id")], 5, "m_score")
    scored = j.select(
        "user_id",
        ((F.unix_micros(F.col("ref_ts")) - F.unix_micros(F.col("last_ts")))
         / F.lit(86400000000)).cast("bigint").alias("recency_days"),
        "frequency",
        "monetary",
        "r_score",
        "f_score",
        "m_score",
    )
    return scored.withColumn(
        "segment",
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ),
    )


@register(
    "window_gaps_islands",
    oracle="""
    WITH r AS (
      SELECT user_id, event_id,
             event_id - row_number() OVER (
               PARTITION BY user_id ORDER BY event_id) AS grp
      FROM events
    )
    SELECT user_id, grp,
           MIN(event_id) AS island_start,
           MAX(event_id) AS island_end,
           COUNT(*) AS island_len
    FROM r GROUP BY user_id, grp
    """,
)
def window_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of consecutive event_ids per
    user via the classic ``id − row_number()`` constant-per-island
    trick — one window pass + one grouped aggregate, both on the
    user_id shuffle key.
    """
    r = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        (
            F.col("event_id")
            - F.row_number().over(W.partitionBy("user_id").orderBy("event_id"))
        ).alias("grp"),
    )
    return r.groupBy("user_id", "grp").agg(
        F.min("event_id").alias("island_start"),
        F.max("event_id").alias("island_end"),
        F.count(F.lit(1)).alias("island_len"),
    )


@register(
    "join_asof_nearest",
    oracle="""
    WITH x AS (
      SELECT user_id, event_id, ts, event_type,
             last_value(CASE WHEN event_type = 'error' THEN event_id END IGNORE NULLS)
               OVER prev AS prev_id,
             last_value(CASE WHEN event_type = 'error' THEN ts END IGNORE NULLS)
               OVER prev AS prev_ts,
             first_value(CASE WHEN event_type = 'error' THEN event_id END IGNORE NULLS)
               OVER nxt AS next_id,
             first_value(CASE WHEN event_type = 'error' THEN ts END IGNORE NULLS)
               OVER nxt AS next_ts
      FROM events
      WINDOW prev AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             nxt AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, event_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
           CASE WHEN prev_ts IS NOT NULL
                 AND (next_ts IS NULL
                      OR epoch_us(ts) - epoch_us(prev_ts)
                         <= epoch_us(next_ts) - epoch_us(ts))
                THEN prev_id ELSE next_id END AS nearest_error_id,
           CASE WHEN prev_ts IS NOT NULL
                 AND (next_ts IS NULL
                      OR epoch_us(ts) - epoch_us(prev_ts)
                         <= epoch_us(next_ts) - epoch_us(ts))
                THEN epoch_us(ts) - epoch_us(prev_ts)
                ELSE epoch_us(next_ts) - epoch_us(ts) END AS nearest_dt_us
    FROM x
    WHERE event_type = 'purchase'
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of NEAREST (the third merge_asof direction): each purchase
    pairs with the closest same-user error in either time direction,
    ties to the earlier side.

    Both direction probes are conditional first/last(ignorenulls)
    windows over the SAME partition+sort — one exchange, one sort,
    two frames; never a range self-join.
    """
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    prev = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    nxt = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, W.unboundedFollowing)
    )
    is_err = F.col("event_type") == "error"
    x = e.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.last(F.when(is_err, F.col("event_id")), ignorenulls=True).over(prev).alias("prev_id"),
        F.last(F.when(is_err, F.col("ts")), ignorenulls=True).over(prev).alias("prev_ts"),
        F.first(F.when(is_err, F.col("event_id")), ignorenulls=True).over(nxt).alias("next_id"),
        F.first(F.when(is_err, F.col("ts")), ignorenulls=True).over(nxt).alias("next_ts"),
    ).filter(F.col("event_type") == "purchase")
    d_prev = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("prev_ts"))
    d_next = F.unix_micros(F.col("next_ts")) - F.unix_micros(F.col("ts"))
    take_prev = F.col("prev_ts").isNotNull() & (
        F.col("next_ts").isNull() | (d_prev <= d_next)
    )
    return x.select(
        "user_id",
        "event_id",
        _fmt_ts("ts", TS_FMT_US).alias("ts"),
        F.when(take_prev, F.col("prev_id")).otherwise(F.col("next_id")).alias("nearest_error_id"),
        F.when(take_prev, d_prev).otherwise(d_next).alias("nearest_dt_us"),
    )


@register(
    "event_cohort_ltv",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, CAST(MIN(ts) AS DATE) AS cohort_day FROM events GROUP BY user_id
    ),
    wk AS (
      SELECT strftime(date_trunc('week', f.cohort_day), '%Y-%m-%d') AS cohort_week,
             CAST(date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) // 7 AS INT)
               AS week_offset,
             CAST(CAST(SUM(CAST(CAST(e.value AS VARCHAR) AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE)
               AS revenue
      FROM events e JOIN first_seen f ON e.user_id = f.user_id
      WHERE e.event_type = 'purchase'
      GROUP BY 1, 2
    )
    SELECT cohort_week, week_offset, revenue,
           CAST(CAST(SUM(CAST(CAST(revenue AS VARCHAR) AS DECIMAL(30,8))) OVER (
             PARTITION BY cohort_week ORDER BY week_offset) AS VARCHAR) AS DOUBLE)
             AS cumulative_ltv
    FROM wk
    """,
)
def event_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime value: purchase revenue per (first-seen week,
    week offset), with the running cumulative LTV curve per cohort.

    Composition of the retention shape with a decimal-exact window
    cumsum — grouped revenue first (map-combined), then a window over
    the tiny (cohort, offset) aggregate, so the cumsum never touches
    raw events.
    """
    e = load_table(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(F.min("ts").cast("date").alias("cohort_day"))
    wk = (
        e.filter(F.col("event_type") == "purchase")
        .join(first_seen, "user_id")
        .select(
            F.date_format(F.date_trunc("week", "cohort_day"), "yyyy-MM-dd").alias(
                "cohort_week"
            ),
            F.floor(
                F.datediff(F.col("ts").cast("date"), F.col("cohort_day")) / 7
            ).cast("int").alias("week_offset"),
            "value",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.sum(F.col("value").cast("decimal(30,8)")).cast("double").alias("revenue"))
    )
    cum = (
        F.sum(F.col("revenue").cast("decimal(30,8)"))
        .over(W.partitionBy("cohort_week").orderBy("week_offset"))
        .cast("double")
    )
    return wk.select(
        "cohort_week", "week_offset", "revenue", cum.alias("cumulative_ltv")
    )


@register(
    "event_view_abandonment",
    oracle="""
    WITH v AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'view'),
    converted AS (
      SELECT DISTINCT v.event_id
      FROM v JOIN events p
        ON p.user_id = v.user_id
       AND p.event_type = 'purchase'
       AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
    )
    SELECT v.user_id,
           COUNT(*) AS n_views,
           COUNT(*) - COUNT(c.event_id) AS n_abandoned,
           CAST(COUNT(*) - COUNT(c.event_id) AS DOUBLE) / COUNT(*)
             AS abandonment_rate
    FROM v LEFT JOIN converted c ON v.event_id = c.event_id
    GROUP BY v.user_id
    """,
)
def event_view_abandonment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Abandonment: views NOT followed by a same-user purchase within
    1 hour — the A-not-then-B inverse of the pattern probe, spelled
    as an anti band-join (equi on user_id, the hour band inside the
    join), then per-user exact rates.
    """
    e = load_table(spark, sf_dir, "events")
    v = e.filter(F.col("event_type") == "view").select("user_id", "event_id", "ts")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    abandoned = v.join(
        p,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") > F.col("ts"))
        & (F.unix_micros(F.col("p_ts")) <= F.unix_micros(F.col("ts")) + 3600000000),
        "left_anti",
    )
    n_views = v.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_views"))
    n_abandoned = abandoned.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_abandoned")
    )
    j = n_views.join(n_abandoned, "user_id", "left").select(
        "user_id",
        "n_views",
        F.coalesce(F.col("n_abandoned"), F.lit(0)).alias("n_abandoned"),
    )
    return j.withColumn(
        "abandonment_rate",
        F.col("n_abandoned").cast("double") / F.col("n_views"),
    )


@register(
    "event_dau_wau_stickiness",
    oracle="""
    WITH daily AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    days AS (SELECT DISTINCT day FROM daily),
    dau AS (SELECT day, COUNT(*) AS dau FROM daily GROUP BY day),
    wau AS (
      SELECT d.day, COUNT(DISTINCT a.user_id) AS wau
      FROM days d JOIN daily a
        ON a.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
      GROUP BY d.day
    )
    SELECT strftime(dau.day, '%Y-%m-%d') AS day, dau.dau, wau.wau,
           CAST(dau.dau AS DOUBLE) / wau.wau AS stickiness
    FROM dau JOIN wau ON dau.day = wau.day
    """,
)
def event_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU / stickiness ratio per day — the
    product-health metric triple.

    The trailing-week distinct is a band join of the DAY dimension
    (tiny — one row per day) against the deduplicated (day, user)
    table, never against raw events; both inputs come off one
    map-combined distinct.  Counts are exact, the ratio per-row.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.select(F.col("ts").cast("date").alias("day"), "user_id").distinct()
    days = daily.select("day").distinct()
    dau = daily.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    wau = (
        days.alias("d")
        .join(
            daily.alias("a"),
            (F.col("a.day") >= F.date_sub(F.col("d.day"), 6))
            & (F.col("a.day") <= F.col("d.day")),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.countDistinct("a.user_id").alias("wau"))
    )
    return (
        dau.join(wau, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau",
            (F.col("dau").cast("double") / F.col("wau")).alias("stickiness"),
        )
    )
