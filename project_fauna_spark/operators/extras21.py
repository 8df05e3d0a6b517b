"""Round-6 batch 15: a length-vs-vocabulary curation diagnostic and a
weekday-deseasonalized volume anomaly detector.

Registered AFTER the round-6 grading window block (plans/__init__) —
new registrations must never perturb the first-50 window the driver
grades (pinned by tests/test_window_manifest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from project_fauna_spark.cache import cached
from project_fauna_spark.functions.moments import (
    dec19,
    int_pearson_moments,
    pearson_terms,
)
from project_fauna_spark.io import load_table
from project_fauna_spark.plans.registry import register

# --------------------------------------------------------------------------
# text_heaps_diagnostic — does doc length predict vocabulary richness?
# --------------------------------------------------------------------------


@register(
    "text_heaps_diagnostic",
    oracle="""
    WITH t AS (
      SELECT lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS x,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS y
      FROM documents
    ),
    m AS (
      SELECT lang,
             CAST(COUNT(*) AS HUGEINT) AS np,
             SUM(CAST(x AS HUGEINT)) AS sx,
             SUM(CAST(y AS HUGEINT)) AS sy,
             SUM(CAST(x AS HUGEINT) * y) AS sxy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx,
             SUM(CAST(y AS HUGEINT) * y) AS syy
      FROM t GROUP BY lang
    )
    SELECT lang,
           CAST(np AS BIGINT) AS n_docs,
           CAST(sx AS BIGINT) AS total_tokens,
           CAST(sy AS BIGINT) AS total_distinct,
           CASE WHEN np * sxx - sx * sx > 0 AND np * syy - sy * sy > 0
                THEN CAST(CAST(np * sxy - sx * sy AS VARCHAR) AS DOUBLE)
                  / (sqrt(CAST(CAST(np * sxx - sx * sx AS VARCHAR) AS DOUBLE))
                     * sqrt(CAST(CAST(np * syy - sy * sy AS VARCHAR)
                                 AS DOUBLE)))
           END AS len_vocab_corr
    FROM m
    """,
)
def text_heaps_diagnostic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law curation diagnostic per language: the Pearson
    correlation between a document's token count and its DISTINCT
    token count.  Near 1.0 means vocabulary still grows linearly with
    length (short, diverse docs); a depressed value means long
    documents are repeating themselves — the same signal
    ``llm_gopher_repetition`` reads per-document, here as a
    corpus-level sufficient statistic that tells a filter designer
    whether length caps double as repetition caps.

    Both variables are exact integers, so all five Pearson moments
    accumulate exactly in decimal(38,0) (HUGEINT in the oracle) and
    the correlation is one division over two IEEE-exact sqrts of
    identical integers — the ``ts_acf_daily`` float contract.
    Zero-variance groups return NULL rather than dividing.  Scale:
    one map-combined aggregate per language over a single scan; the
    token split is the cheap whitespace tokenizer, never a UDF.
    """
    words = F.split(F.col("text"), " ")
    t = load_table(spark, sf_dir, "documents").select(
        "lang",
        F.size(words).cast("long").alias("x"),
        F.size(F.array_distinct(words)).cast("long").alias("y"),
    )
    m = int_pearson_moments(t, ["lang"])
    _, dx, dy, raw_corr = pearson_terms()
    corr = F.when((dx > 0) & (dy > 0), raw_corr)
    return m.select(
        "lang",
        F.col("np_l").cast("long").alias("n_docs"),
        F.col("sx").cast("long").alias("total_tokens"),
        F.col("sy").cast("long").alias("total_distinct"),
        corr.alias("len_vocab_corr"),
    )


# --------------------------------------------------------------------------
# dq_seasonal_adjusted_anomaly — anomalies AFTER removing the weekly cycle
# --------------------------------------------------------------------------

_ANOM_TOP_K = 5
_ANOM_SCALE = 1_000_000  # fixed-point quantization of the adjusted series


@register(
    "dq_seasonal_adjusted_anomaly",
    oracle=f"""
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
                   CAST(SUM(n_events) AS BIGINT) AS te FROM wd),
    adj AS (
      SELECT d.day, d.n,
             CAST(floor(
               (CAST(d.n AS DOUBLE)
                  / ((CAST(w.n_events AS DOUBLE) / w.n_days)
                     / (CAST(t.te AS DOUBLE) / t.td)))
               * {_ANOM_SCALE}) AS BIGINT) AS ai
      FROM daily d
      JOIN wd w ON w.iso_dow = isodow(d.day)
      CROSS JOIN tot t
    ),
    m AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS np,
             SUM(CAST(ai AS HUGEINT)) AS m1,
             SUM(CAST(ai AS HUGEINT) * ai) AS m2
      FROM adj
    )
    SELECT day, n,
           CAST(CAST(np * ai - m1 AS VARCHAR) AS DOUBLE)
             / sqrt(CAST(CAST(np * m2 - m1 * m1 AS VARCHAR) AS DOUBLE)) AS z
    FROM adj CROSS JOIN m
    WHERE np * m2 - m1 * m1 > 0
    ORDER BY abs(CAST(CAST(np * ai - m1 AS VARCHAR) AS DOUBLE)
             / sqrt(CAST(CAST(np * m2 - m1 * m1 AS VARCHAR) AS DOUBLE))) DESC,
             day
    LIMIT {_ANOM_TOP_K}
    """,
)
def dq_seasonal_adjusted_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The top-{5} most anomalous traffic days AFTER dividing out the
    weekly cycle: raw daily counts are deflated by their ISO-weekday
    seasonal index (the ``ts_weekday_profile`` factor), and the
    deseasonalized series is z-scored — so a big Saturday no longer
    trips the alarm just for being Saturday, which is exactly the
    false-positive class ``dq_control_chart`` (raw 3σ) suffers.
    Returns each flagged day with its raw count and adjusted z.

    Float discipline: the adjusted value is three IEEE divisions of
    exact integers (identical in both engines), then QUANTIZED to
    10⁻⁶ fixed-point — from there the mean/variance moments are exact
    integer arithmetic in decimal(38,0)/HUGEINT, and the z-score is
    the single division ``(n·aᵢ − Σa) / √(n·Σa² − (Σa)²)`` — the
    ``ts_acf_daily`` contract, so ordering by |z| is cross-engine
    stable (day tie-break).  Scale: one map-combined daily aggregate;
    everything else lives on the calendar-bounded frame (broadcast
    7-row index + 1-row moment table); the edge is sort+limit.
    """
    # daily feeds the weekday index AND the adjusted series; adj feeds
    # the moment table AND the final select — persist both so the
    # events scan + aggregate runs once, not once per plan branch.
    daily = cached(
        load_table(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("day"))
        .groupBy("day")
        .agg(F.count("*").alias("n"))
    )
    iso = (F.expr("weekday(day)") + F.lit(1)).cast("long")
    wd = cached(
        daily.groupBy(iso.alias("iso_dow")).agg(
            F.count("*").alias("n_days"), F.sum("n").alias("n_events")
        )
    )
    tot = wd.agg(F.sum("n_days").alias("td"), F.sum("n_events").alias("te"))
    idx = (F.col("n_events").cast("double") / F.col("n_days")) / (
        F.col("te").cast("double") / F.col("td")
    )
    ai = F.floor((F.col("n").cast("double") / idx) * F.lit(_ANOM_SCALE)).cast(
        "long"
    )
    adj = cached(
        daily.join(F.broadcast(wd), iso == F.col("iso_dow"))
        .crossJoin(F.broadcast(tot))
        .select("day", "n", ai.alias("ai"))
    )
    m = adj.agg(
        F.count("*").alias("np_l"),
        F.sum(dec19(F.col("ai"))).alias("m1"),
        F.sum(dec19(F.col("ai")) * dec19(F.col("ai"))).alias("m2"),
    )
    np_d = F.col("np_l").cast("decimal(38,0)")
    var_n = np_d * F.col("m2") - F.col("m1") * F.col("m1")
    z = (np_d * dec19(F.col("ai")) - F.col("m1")).cast("double") / F.sqrt(
        var_n.cast("double")
    )
    return (
        adj.crossJoin(F.broadcast(m))
        .filter(var_n > 0)
        .select("day", "n", z.alias("z"))
        .orderBy(F.abs(F.col("z")).desc(), "day")
        .limit(_ANOM_TOP_K)
    )
