"""Round-12 additions (2 seats, per the thaw-criterion throttle in
CLAUDE.md): two production-pipeline audits the registry still lacked.

``text_char_entropy`` — per-document character-level Shannon entropy,
the classic cheap boilerplate/low-diversity filter in web-corpus
curation (CCNet-lineage pipelines drop near-zero-entropy documents
before any model-based scoring).  Complements ``llm_gopher_repetition``
(which scores n-gram REPEAT mass) with the distributional signal:
a page of one repeated word has low entropy but may have zero 2-gram
repetition beyond its period, and vice versa.

``ml_calibration_ece`` — reliability-diagram table + Expected
Calibration Error, the standard audit for classifier confidence
(Guo et al. 2017 lineage); completes the eval battery next to
``ml_auc_ranksum`` (discrimination) and ``ml_best_f1_threshold``
(thresholding) with the calibration axis.

Registered after extras56 so every pinned grading window is untouched;
joins a window only via GRADING_WINDOW once the re-grade debt is
serviced (CLAUDE.md thaw criterion, decided r11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from project_fauna_spark.functions.wordhash import h32
from project_fauna_spark.io import load_table
from project_fauna_spark.operators._oracle_shared import sql_h32
from project_fauna_spark.plans.registry import register

# Fixed count-bucket order: 26 lowercase letters, space, then the
# "other" remainder bucket.  The ORDER is the cross-engine contract —
# both entropy folds walk these buckets left to right.
_ALPHABET = "abcdefghijklmnopqrstuvwxyz "


def _sql_char_counts() -> str:
    terms = ", ".join(
        f"length(t) - length(replace(t, '{ch}', ''))" for ch in _ALPHABET
    )
    return f"list_value({terms})"


@register(
    "text_char_entropy",
    oracle=f"""
    WITH lowered AS (
      SELECT doc_id, lang, lower(text) AS t
      FROM documents WHERE length(text) > 0
    ),
    counted AS (
      SELECT doc_id, lang, CAST(length(t) AS BIGINT) AS n,
             {_sql_char_counts()} AS cl
      FROM lowered
    ),
    buckets AS (
      SELECT doc_id, lang, n,
             list_append(cl, n - list_reduce(cl, (a, b) -> a + b)) AS cl2
      FROM counted
    )
    SELECT doc_id, lang, n AS n_chars_lower,
           round(ln(CAST(n AS DOUBLE))
                 - list_reduce(
                     list_prepend(CAST(0 AS DOUBLE),
                       list_transform(cl2, c -> CASE WHEN c > 0
                         THEN CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))
                         ELSE CAST(0 AS DOUBLE) END)),
                     (a, b) -> a + b) / CAST(n AS DOUBLE),
                 9) AS entropy_r9
    FROM buckets
    """,
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-level Shannon entropy (nats) over a FIXED
    28-bucket alphabet: the 26 lowercase letters, space, and one
    "other" remainder bucket — the cheap low-diversity/boilerplate
    filter of web-corpus curation.

    Float-parity spelling (the ``dq_psi_drift`` discipline): bucket
    counts are EXACT integers obtained without any explode —
    ``length(t) − length(replace(t, ch, ''))`` per bucket, 27 JVM-side
    scans of the string, no shuffle, no per-char row blowup (the
    explode-per-character spelling would also hit the engines'
    different code-unit-vs-codepoint splitting of multibyte text;
    counting fixed ASCII buckets sidesteps that entirely).  Entropy is
    rewritten as H = ln(n) − (Σ c·ln c)/n so the fold's lambda touches
    ONLY its element (no outer-column reference inside the HOF — the
    ``dedup._zipped_trigrams`` shape), and the Σ runs in the fixed
    bucket order on BOTH engines (``F.aggregate`` over the literal
    array / ``list_reduce`` over ``list_value``), never a cross-row
    sum.  The only cross-engine divergence left is libm-vs-JVM ``ln``
    (≤1 ulp per term), absorbed by ``round(…, 9)`` on both sides of an
    already-ulp-tight value — the ``text_tfidf_topk`` absorption.

    Scale: a pure map-side projection — zero shuffles, zero joins; at
    100 TB it is one codegen'd pass over the text column with 28
    constant-pattern replaces per row, and the parquet scan prunes to
    (doc_id, lang, text).
    """
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length("text") > 0)
        .select("doc_id", "lang", F.lower(F.col("text")).alias("t"))
    )
    n = F.length("t").cast("long")
    counts = [
        (n - F.length(F.replace(F.col("t"), F.lit(ch)))).alias(f"c{i}")
        for i, ch in enumerate(_ALPHABET)
    ]
    counted = d.select("doc_id", "lang", n.alias("n"), *counts)
    other = F.col("n") - sum(F.col(f"c{i}") for i in range(len(_ALPHABET)))
    cl2 = F.array(
        *[F.col(f"c{i}") for i in range(len(_ALPHABET))], other.alias("other")
    )
    s = F.aggregate(
        cl2,
        F.lit(0.0),
        lambda acc, c: acc
        + F.when(
            c > 0, c.cast("double") * F.log(c.cast("double"))
        ).otherwise(F.lit(0.0)),
    )
    nd = F.col("n").cast("double")
    return counted.select(
        "doc_id",
        "lang",
        F.col("n").alias("n_chars_lower"),
        F.round(F.log(nd) - s / nd, 9).alias("entropy_r9"),
    )


_CAL_SALT = "cal:"
# Positives get +0.2 confidence: a correlated, not oracle-perfect,
# synthetic classifier — bins 0-1 are pure negatives, 8-9 pure
# positives, the middle mixes.
_CAL_POS_SHIFT = 200


@register(
    "ml_calibration_ece",
    oracle=f"""
    WITH scored AS (
      SELECT {sql_h32("CAST(event_id AS VARCHAR)", _CAL_SALT)} % 800
               + {_CAL_POS_SHIFT}
                 * (CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label
      FROM events
    ),
    bins AS (
      SELECT c // 100 AS bin,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(label) AS BIGINT) AS n_pos,
             SUM(c) AS sum_c
      FROM scored GROUP BY 1
    ),
    tot AS (SELECT SUM(n) AS nt FROM bins),
    terms AS (
      SELECT bin, n, n_pos,
             CAST(n_pos AS DOUBLE) / n AS frac_pos,
             CAST(sum_c AS DOUBLE) / (1000.0 * n) AS conf_avg,
             (CAST(n AS DOUBLE) / nt)
               * abs(CAST(n_pos AS DOUBLE) / n
                     - CAST(sum_c AS DOUBLE) / (1000.0 * n)) AS gap_w
      FROM bins, tot
    )
    SELECT CAST(bin AS BIGINT) AS bin, n, n_pos, frac_pos, conf_avg, gap_w,
           (SELECT list_reduce(
                     list_prepend(CAST(0 AS DOUBLE), list(gap_w ORDER BY bin)),
                     (a, b) -> a + b) FROM terms) AS ece
    FROM terms
    """,
)
def ml_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram table + Expected Calibration Error over a
    deterministic synthetic classifier: confidence c/1000 where
    c = h32(event_id) mod 800 + 200·[purchase] (hash-random but
    label-correlated, the ``sample_reservoir_hash`` determinism
    convention), label = the event being a purchase; 10 equal-width
    confidence bins; ECE = Σ_b (n_b/N)·|acc_b − conf̄_b|.

    Parity: EVERYTHING up to the edge is exact int64 — the portable
    md5-digit hash, the bin id (integer division), and the per-bin
    (n, n_pos, Σc) triples from one map-combined aggregate.  The
    doubles are divisions of those ints spelled IDENTICALLY on both
    engines (IEEE division is correctly rounded, so identical inputs +
    identical expression shape = identical bits; no libm anywhere),
    and ECE folds the ≤10 per-bin terms in bin order on both engines
    (``F.aggregate`` over the bin-sorted struct array / ``list_reduce``
    over ``list(… ORDER BY bin)``) — never an engine-ordered SUM.

    Scale: one map-combined groupBy over 10 bins, then two broadcast
    1-row cross joins (grand total, ECE scalar) — the
    ``event_last_touch_attribution`` percent-of-total shape; no global
    window, no skew exposure (bins are equal-width by construction).
    """
    e = load_table(spark, sf_dir, "events")
    label = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    c = (h32(F.col("event_id").cast("string"), _CAL_SALT) % 800) + (
        F.lit(_CAL_POS_SHIFT) * label
    )
    scored = e.select(c.alias("c"), label.alias("label"))
    bins = (
        scored.withColumn("bin", F.expr("c div 100"))
        .groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.sum("label").alias("n_pos"),
            F.sum("c").alias("sum_c"),
        )
    )
    tot = bins.agg(F.sum("n").alias("nt"))
    frac_pos = F.col("n_pos").cast("double") / F.col("n")
    conf_avg = F.col("sum_c").cast("double") / (F.lit(1000.0) * F.col("n"))
    gap_w = (F.col("n").cast("double") / F.col("nt")) * F.abs(frac_pos - conf_avg)
    terms = bins.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n",
        "n_pos",
        frac_pos.alias("frac_pos"),
        conf_avg.alias("conf_avg"),
        gap_w.alias("gap_w"),
    )
    ece = terms.groupBy().agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("bin", "gap_w"))),
            F.lit(0.0),
            lambda acc, x: acc + x["gap_w"],
        ).alias("ece")
    )
    return terms.crossJoin(F.broadcast(ece)).select(
        F.col("bin").cast("bigint").alias("bin"),
        "n",
        "n_pos",
        "frac_pos",
        "conf_avg",
        "gap_w",
        "ece",
    )
