"""Round-6 batch 8: dedup impact on the training mixture, and
windowed conversion-rate sweeps.

Registered AFTER the round-6 grading window block (plans/__init__) —
new registrations must never perturb the first-50 window the driver
grades (pinned by tests/test_window_manifest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from project_fauna_spark.io import load_table
from project_fauna_spark.plans.registry import register

# --------------------------------------------------------------------------
# llm_dedup_impact_on_mixture — does dedup bias the language mix?
# --------------------------------------------------------------------------


def _dedup_mixture_oracle() -> str:
    from project_fauna_spark.plans.registry import ORACLE

    truth_sql = ORACLE["dedup_ngram_jaccard"]
    return f"""
    WITH raw AS (SELECT doc_id, lang, text FROM documents),
    exact_kept AS (
      SELECT MIN(doc_id) AS doc_id FROM raw GROUP BY text
    ),
    near_drops AS (
      SELECT DISTINCT doc_b AS doc_id FROM ({truth_sql}) t
    ),
    final_kept AS (
      SELECT e.doc_id FROM exact_kept e
      LEFT JOIN near_drops d ON d.doc_id = e.doc_id
      WHERE d.doc_id IS NULL
    ),
    tot AS (
      SELECT (SELECT COUNT(*) FROM raw) AS n_raw_total,
             (SELECT COUNT(*) FROM final_kept) AS n_final_total
    )
    SELECT r.lang,
           CAST(COUNT(*) AS BIGINT) AS n_raw,
           CAST(COUNT(f.doc_id) AS BIGINT) AS n_kept,
           CAST(COUNT(*) AS DOUBLE) / t.n_raw_total AS share_raw,
           CAST(COUNT(f.doc_id) AS DOUBLE) / t.n_final_total AS share_kept,
           (CAST(COUNT(f.doc_id) AS DOUBLE) / t.n_final_total)
             - (CAST(COUNT(*) AS DOUBLE) / t.n_raw_total) AS share_shift
    FROM raw r
    LEFT JOIN final_kept f ON f.doc_id = r.doc_id
    CROSS JOIN tot t
    GROUP BY r.lang, t.n_raw_total, t.n_final_total
    """


@register("llm_dedup_impact_on_mixture", oracle_builder=_dedup_mixture_oracle)
def llm_dedup_impact_on_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup bias audit: per language, the corpus share BEFORE and
    AFTER the dedup stack (exact min-id survivorship, then the
    near-dup greedy drop set) — boilerplate concentrates in specific
    languages/sources, so dedup silently shifts the training mixture;
    this is the number that says whether ``llm_domain_mixture_weights``
    must be re-fit after dedup.

    Stages are the repo's canonical ones: exact survivors = min(doc_id)
    per text; near drops = distinct higher-id members of the exact
    df-capped Jaccard pair set (composed lazily from
    ``dedup_ngram_jaccard`` — its oracle text is spliced into this
    oracle by the deferred builder).  Counts are exact; shares are one
    division each; the shift is a difference of two identically-derived
    doubles.  Scale: the pair plan is the df-capped inverted index;
    everything else is hash aggregates and an anti-join.
    """
    from project_fauna_spark.operators.dedup import dedup_ngram_jaccard

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    exact_kept = d.groupBy("text").agg(F.min("doc_id").alias("doc_id")).select(
        "doc_id"
    )
    near_drops = (
        dedup_ngram_jaccard(spark, sf_dir)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    final_kept = exact_kept.join(near_drops, "doc_id", "left_anti").withColumn(
        "kept", F.lit(1)
    )
    # r12: pin the |langs|-row aggregate, not the corpus.  The old
    # spelling cached `tagged` = corpus ⋈ final_kept WITH the full text
    # column (the cache pinned every byte of corpus text) and then ran
    # a SECOND full pass over it for the totals row.  The totals are
    # exact int64 sums of the per-language counts (Σ per-group COUNT(*)
    # == COUNT(*), Σ per-group kept-sums == global kept-sum — the
    # llm_ccnet_buckets totals-from-the-aggregate fix), so one
    # projected pass + a bytes-sized pin replaces a corpus-sized pin +
    # two passes; the dedup pair pipeline still runs exactly once.
    from project_fauna_spark.cache import cached

    tagged = d.select("doc_id", "lang").join(final_kept, "doc_id", "left")
    per_lang = cached(
        tagged.groupBy("lang").agg(
            F.count("*").alias("n_raw"),
            F.sum(F.coalesce("kept", F.lit(0))).cast("long").alias("n_kept"),
        )
    )
    tot = per_lang.agg(
        F.sum("n_raw").alias("n_raw_total"),
        F.sum("n_kept").alias("n_final_total"),
    )
    share_raw = F.col("n_raw").cast("double") / F.col("n_raw_total")
    share_kept = F.col("n_kept").cast("double") / F.col("n_final_total")
    return per_lang.crossJoin(F.broadcast(tot)).select(
        "lang",
        F.col("n_raw").cast("long").alias("n_raw"),
        "n_kept",
        share_raw.alias("share_raw"),
        share_kept.alias("share_kept"),
        (share_kept - share_raw).alias("share_shift"),
    )


# --------------------------------------------------------------------------
# event_conversion_window_sweep — conversion rate vs attribution window
# --------------------------------------------------------------------------

_CONV_WINDOWS_S = [3600, 86400, 604800]  # 1h, 1d, 7d


@register(
    "event_conversion_window_sweep",
    oracle=f"""
    WITH fv AS (
      SELECT user_id, MIN(ts) AS first_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    fp AS (
      SELECT e.user_id, fv.first_view, MIN(e.ts) AS first_purchase
      FROM events e JOIN fv ON fv.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= fv.first_view
      GROUP BY e.user_id, fv.first_view
    ),
    lat AS (
      SELECT fv.user_id,
             epoch_us(fp.first_purchase) - epoch_us(fp.first_view) AS lat_us
      FROM fv LEFT JOIN fp ON fp.user_id = fv.user_id
    ),
    sweep(w_s) AS (VALUES {", ".join(f"({w})" for w in _CONV_WINDOWS_S)})
    SELECT CAST(w_s AS BIGINT) AS window_seconds,
           CAST((SELECT COUNT(*) FROM fv) AS BIGINT) AS n_viewers,
           CAST(COUNT(CASE WHEN lat_us IS NOT NULL
                           AND lat_us <= w_s * CAST(1000000 AS BIGINT)
                      THEN 1 END) AS BIGINT) AS n_converted,
           CAST(COUNT(CASE WHEN lat_us IS NOT NULL
                           AND lat_us <= w_s * CAST(1000000 AS BIGINT)
                      THEN 1 END) AS DOUBLE)
             / (SELECT COUNT(*) FROM fv) AS conversion_rate
    FROM sweep CROSS JOIN lat
    GROUP BY w_s
    """,
)
def event_conversion_window_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion rate as a function of the attribution window (1 h /
    1 day / 7 days): what fraction of first-time viewers purchase
    within each window — the curve that picks an attribution policy
    instead of assuming one (the ``sim_ivf_nprobe_sweep`` one-pass
    sweep pattern applied to funnel latency).

    Latencies are computed ONCE (two user-keyed aggregates + one equi
    join, exact integer µs); the 3-window sweep is a tiny broadcast
    cross join over the per-user latency table.  Counts are exact; the
    rate is one division by the (nonzero, inner-aggregated) viewer
    count.
    """
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    from project_fauna_spark.cache import cached

    # fv feeds the purchase join, the latency table, and the viewer
    # count — persist so the events scan+aggregate runs once.
    fv = cached(
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    fp = (
        e.filter(F.col("event_type") == "purchase")
        .join(fv, "user_id")
        .filter(F.col("ts") >= F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"), F.min("first_view").alias("fv"))
    )
    lat = fv.join(fp.select("user_id", "first_purchase", "fv"), "user_id", "left").select(
        "user_id",
        (F.unix_micros("first_purchase") - F.unix_micros("fv")).alias("lat_us"),
    )
    n_viewers = fv.agg(F.count("*").alias("n_viewers"))
    sweep = spark.createDataFrame(
        [(w,) for w in _CONV_WINDOWS_S], "w_s long"
    )
    converted = (
        F.col("lat_us").isNotNull()
        & (F.col("lat_us") <= F.col("w_s") * F.lit(1_000_000))
    ).cast("long")
    swept = (
        F.broadcast(sweep)
        .crossJoin(lat)
        .groupBy("w_s")
        .agg(F.sum(converted).alias("n_converted"))
    )
    return swept.crossJoin(F.broadcast(n_viewers)).select(
        F.col("w_s").cast("long").alias("window_seconds"),
        F.col("n_viewers").cast("long").alias("n_viewers"),
        F.col("n_converted").cast("long").alias("n_converted"),
        (F.col("n_converted").cast("double") / F.col("n_viewers")).alias(
            "conversion_rate"
        ),
    )
