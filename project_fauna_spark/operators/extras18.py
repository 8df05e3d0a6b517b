"""Round-6 batch 12: lead–lag cross-correlation between event series,
exact best-F1 threshold selection, and a weekday seasonality profile.

Registered AFTER the round-6 grading window block (plans/__init__) —
new registrations must never perturb the first-50 window the driver
grades (pinned by tests/test_window_manifest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from project_fauna_spark.cache import cached
from project_fauna_spark.functions.moments import (
    int_pearson_moments,
    pearson_terms,
)
from project_fauna_spark.functions.ranks import bucket_offsets_multi
from project_fauna_spark.io import load_table
from project_fauna_spark.plans.registry import register

# --------------------------------------------------------------------------
# ts_crosscorr_daily — does view traffic LEAD purchases, and by how much?
# --------------------------------------------------------------------------

_XCORR_LAGS = [0, 1, 2, 3, 7]


@register(
    "ts_crosscorr_daily",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS x,
             CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
               AS y
      FROM events GROUP BY 1
    ),
    lags(lag) AS (VALUES {", ".join(f"({k})" for k in _XCORR_LAGS)}),
    pairs AS (
      SELECT l.lag, a.x, b.y
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
             AS xcorr
    FROM m
    WHERE np * sxx - sx * sx > 0 AND np * syy - sy * sy > 0
    """,
)
def ts_crosscorr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation between the daily VIEW count and the daily
    PURCHASE count at lags 0/1/2/3/7: the Pearson correlation of
    ``(views(d), purchases(d+k))`` pairs — the lead–lag detector that
    says whether traffic predicts conversions and at what horizon
    (``ts_acf_daily`` answers the same question for one series against
    itself).  Both series live on the union calendar with explicit
    zero counts (a day with views but no purchases contributes y = 0,
    not a dropped pair), so the statistic is not survivorship-biased.

    Everything before the final division is EXACT integer arithmetic:
    one map-combined aggregate builds the calendar-bounded (day, x, y)
    frame in a single events scan; each lag's moments (Σx, Σy, Σxy,
    Σx², Σy²) accumulate in decimal(38,0) (HUGEINT in the oracle) and
    the correlation operands cast to double from the same exact
    integers on both engines — sqrt is IEEE-correctly-rounded (memory:
    sqrt-safe where pow is not).  Zero-variance lags are filtered, not
    divided.  Scale: the lag self-join and moments run on the tiny
    daily frame regardless of corpus size.
    """
    daily = cached(
        load_table(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("day"), "event_type")
        .groupBy("day")
        .agg(
            F.count(F.when(F.col("event_type") == "view", 1)).alias("x"),
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias("y"),
        )
    )
    lags = spark.createDataFrame([(k,) for k in _XCORR_LAGS], "lag int")
    a = daily.select(F.col("day").alias("a_day"), "x")
    bset = daily.select(F.col("day").alias("b_day"), "y")
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
            corr.alias("xcorr"),
        )
    )


# --------------------------------------------------------------------------
# ml_best_f1_threshold — exact operating-point selection, one-vs-rest
# --------------------------------------------------------------------------

_F1_BUCKET_SCALE = 16  # score-range buckets for the two-phase cumsum


@register(
    "ml_best_f1_threshold",
    oracle="""
    WITH scored AS (
      SELECT CAST(embedding[1] AS DOUBLE) AS score, label FROM embeddings
    ),
    cnt AS (SELECT score, label, COUNT(*) AS n_sl FROM scored GROUP BY 1, 2),
    sc AS (SELECT score, CAST(SUM(n_sl) AS BIGINT) AS n_all FROM cnt
           GROUP BY 1),
    lab AS (SELECT label, CAST(SUM(n_sl) AS BIGINT) AS np FROM cnt
            GROUP BY 1),
    grid AS (
      SELECT l.label, s.score, s.n_all, l.np,
             CAST(COALESCE(c.n_sl, 0) AS BIGINT) AS n_pos
      FROM lab l CROSS JOIN sc s
      LEFT JOIN cnt c ON c.label = l.label AND c.score = s.score
    ),
    cum AS (
      SELECT label, score, np,
             np - CAST(COALESCE(SUM(n_pos) OVER w, 0) AS BIGINT) AS tp,
             (SELECT CAST(SUM(n_all) AS BIGINT) FROM sc)
               - CAST(COALESCE(SUM(n_all) OVER w, 0) AS BIGINT) AS pp
      FROM grid
      WINDOW w AS (PARTITION BY label ORDER BY score
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    best AS (
      SELECT label,
             MAX(struct_pack(
               f := CAST(2 * tp AS DOUBLE) / (pp + np),
               nt := -score, tp := tp, pp := pp, np := np)) AS b
      FROM cum GROUP BY label
    )
    SELECT label,
           CAST(b.np AS BIGINT) AS n_pos,
           -b.nt AS threshold,
           CAST(b.tp AS BIGINT) AS tp,
           CAST(b.pp - b.tp AS BIGINT) AS fp,
           CAST(b.np - b.tp AS BIGINT) AS fn,
           CAST(b.tp AS DOUBLE) / b.pp AS precision_at,
           CAST(b.tp AS DOUBLE) / b.np AS recall_at,
           b.f AS f1
    FROM best
    """,
)
def ml_best_f1_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact classifier threshold tuning, one-vs-rest per label: sweep
    EVERY distinct score as the decision threshold (predict positive
    iff ``score ≥ t``), and report the operating point maximizing F1 —
    with its confusion counts, precision and recall.  This is the
    post-AUC step of a model-eval pipeline (``ml_auc_ranksum`` says how
    good the ranking is; this says where to cut it).

    The threshold sweep never materializes per-row predictions: TP(t)
    and predicted-positives(t) are SUFFIX sums over the distinct-score
    frame, computed as ``total − exclusive-prefix-sum`` with the repo's
    two-phase cumsum (bucket-local windows over floor(score·16) buckets
    + ONE broadcast ``bucket_offsets_multi`` pass per label covering
    both measures — never a global sort window).  All counts are exact
    integers; F1 = 2·TP/(PP+P) and the precision/recall are single
    IEEE divisions of identical integers in both engines, and the
    argmax breaks F1 ties to the smallest threshold via a struct max
    over (f1, −score) — the ``dq_ks_two_sample`` convention.  Scale:
    one (score,label)-keyed aggregate of the fact table; everything
    after runs on the labels × distinct-scores grid.
    """
    e = load_table(spark, sf_dir, "embeddings").select(
        F.col("embedding").getItem(0).cast("double").alias("score"), "label"
    )
    # cnt feeds the score marginal, the label marginal AND the grid
    # join — persist the (score,label)-distinct frame so the embeddings
    # scan + aggregate runs once.
    cnt = cached(
        e.groupBy("score", "label").agg(F.count("*").alias("n_sl"))
    )
    sc = cnt.groupBy("score").agg(F.sum("n_sl").alias("n_all"))
    lab = cnt.groupBy("label").agg(F.sum("n_sl").alias("np"))
    grid = (
        sc.crossJoin(F.broadcast(lab))
        .join(
            cnt.select("score", "label", F.col("n_sl").alias("_n_pos")),
            ["score", "label"],
            "left",
        )
        .select(
            "label",
            "score",
            "n_all",
            "np",
            F.coalesce(F.col("_n_pos"), F.lit(0)).cast("long").alias("n_pos"),
            F.floor(F.col("score") * _F1_BUCKET_SCALE).cast("long").alias("bkt"),
        )
    )
    # One aggregate pass yields BOTH exclusive-prefix offsets and both
    # per-label totals (Σ n_all over the full grid = grand total, since
    # every label row spans every distinct score).
    offs = bucket_offsets_multi(
        grid,
        ["label"],
        "bkt",
        [(F.col("n_pos"), "off_pos", "tot_pos"),
         (F.col("n_all"), "off_all", "tot_all")],
    )
    w_loc = (
        W.partitionBy("label", "bkt")
        .orderBy("score")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    lt_pos = F.col("off_pos") + F.coalesce(
        F.sum("n_pos").over(w_loc), F.lit(0)
    )
    lt_all = F.col("off_all") + F.coalesce(
        F.sum("n_all").over(w_loc), F.lit(0)
    )
    cum = grid.join(F.broadcast(offs), ["label", "bkt"]).select(
        "label",
        "score",
        F.col("np").cast("long").alias("np_t"),
        (F.col("tot_pos").cast("long") - lt_pos).cast("long").alias("tp"),
        (F.col("tot_all").cast("long") - lt_all).cast("long").alias("pp"),
    )
    f1 = (F.lit(2) * F.col("tp")).cast("double") / (
        F.col("pp") + F.col("np_t")
    )
    best = cum.groupBy("label").agg(
        F.max(
            F.struct(
                f1.alias("f"),
                (-F.col("score")).alias("nt"),
                F.col("tp").alias("tp"),
                F.col("pp").alias("pp"),
                F.col("np_t").alias("np"),
            )
        ).alias("b")
    )
    return best.select(
        "label",
        F.col("b.np").alias("n_pos"),
        (-F.col("b.nt")).alias("threshold"),
        F.col("b.tp").alias("tp"),
        (F.col("b.pp") - F.col("b.tp")).alias("fp"),
        (F.col("b.np") - F.col("b.tp")).alias("fn"),
        (F.col("b.tp").cast("double") / F.col("b.pp")).alias("precision_at"),
        (F.col("b.tp").cast("double") / F.col("b.np")).alias("recall_at"),
        F.col("b.f").alias("f1"),
    )


# --------------------------------------------------------------------------
# ts_weekday_profile — seasonal index per ISO weekday
# --------------------------------------------------------------------------


@register(
    "ts_weekday_profile",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    wd AS (
      SELECT isodow(day) AS iso_dow,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(n) AS BIGINT) AS n_events
      FROM daily GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(n_days) AS BIGINT) AS td,
                   CAST(SUM(n_events) AS BIGINT) AS te FROM wd)
    SELECT CAST(iso_dow AS BIGINT) AS iso_dow,
           n_days,
           n_events,
           CAST(n_events AS DOUBLE) / n_days AS avg_events,
           (CAST(n_events AS DOUBLE) / n_days)
             / (CAST(te AS DOUBLE) / td) AS seasonal_index
    FROM wd CROSS JOIN tot
    """,
)
def ts_weekday_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly seasonality profile: for each ISO weekday (1 = Monday …
    7 = Sunday), the number of observed days, total events, mean
    events per day, and the SEASONAL INDEX — that weekday's mean over
    the all-days mean (1.0 = flat; >1 = busy day).  This is the
    multiplicative weekday factor a deseasonalizer or staffing
    forecast consumes, and the direct readout of whatever lag-7
    structure ``ts_acf_daily`` detects.

    Counts are exact integers end-to-end; the two means and their
    ratio are three IEEE double divisions of identical integers in
    both engines (no cross-row float accumulation anywhere).  The
    weekday key is ISO in both engines (Spark ``weekday()+1`` ≡ DuckDB
    ``isodow``).  Scale: one map-combined daily aggregate of the fact
    table, then a ≤7-row frame with a broadcast 1-row total.
    """
    daily = (
        load_table(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("day"))
        .groupBy("day")
        .agg(F.count("*").alias("n"))
    )
    # wd feeds the totals aggregate AND the final select — persist the
    # ≤7-row frame so the events scan + daily aggregate runs once.
    wd = cached(
        daily.groupBy(
            (F.expr("weekday(day)") + F.lit(1)).cast("long").alias("iso_dow")
        ).agg(
            F.count("*").alias("n_days"),
            F.sum("n").alias("n_events"),
        )
    )
    tot = wd.agg(
        F.sum("n_days").alias("td"), F.sum("n_events").alias("te")
    )
    avg_events = F.col("n_events").cast("double") / F.col("n_days")
    overall = F.col("te").cast("double") / F.col("td")
    return wd.crossJoin(F.broadcast(tot)).select(
        "iso_dow",
        F.col("n_days").cast("long").alias("n_days"),
        F.col("n_events").cast("long").alias("n_events"),
        avg_events.alias("avg_events"),
        (avg_events / overall).alias("seasonal_index"),
    )
