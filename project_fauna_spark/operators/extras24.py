"""Round-6 batch 18: token-weighted dedup savings and an out-of-order
event-arrival audit (the watermark-tuning input).

Registered AFTER the round-6 grading window block (plans/__init__) —
new registrations must never perturb the first-50 window the driver
grades (pinned by tests/test_window_manifest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from project_fauna_spark.io import load_table
from project_fauna_spark.plans.registry import register

# --------------------------------------------------------------------------
# llm_dedup_token_savings — compute saved, measured in tokens not docs
# --------------------------------------------------------------------------


def _dedup_token_savings_oracle() -> str:
    from project_fauna_spark.plans.registry import ORACLE

    truth_sql = ORACLE["dedup_ngram_jaccard"]
    return f"""
    WITH raw AS (
      SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS toks, text
      FROM documents
    ),
    exact_kept AS (SELECT MIN(doc_id) AS doc_id FROM raw GROUP BY text),
    near_drops AS (
      SELECT DISTINCT doc_b AS doc_id FROM ({truth_sql}) t
    ),
    final_kept AS (
      SELECT e.doc_id FROM exact_kept e
      LEFT JOIN near_drops d ON d.doc_id = e.doc_id
      WHERE d.doc_id IS NULL
    )
    SELECT r.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs_raw,
           CAST(SUM(r.toks) AS BIGINT) AS tokens_raw,
           CAST(SUM(CASE WHEN f.doc_id IS NOT NULL THEN r.toks ELSE 0 END)
                AS BIGINT) AS tokens_kept,
           CAST(SUM(CASE WHEN f.doc_id IS NULL THEN r.toks ELSE 0 END)
                AS BIGINT) AS tokens_saved,
           CAST(SUM(CASE WHEN f.doc_id IS NULL THEN r.toks ELSE 0 END)
                AS DOUBLE) / SUM(r.toks) AS save_frac
    FROM raw r
    LEFT JOIN final_kept f ON f.doc_id = r.doc_id
    GROUP BY r.source
    """


@register("llm_dedup_token_savings", oracle_builder=_dedup_token_savings_oracle)
def llm_dedup_token_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-compute savings from the dedup stack, measured in
    TOKENS per source — docs-dropped counts
    (``llm_dedup_survivorship_report``) understate the win when
    duplicates skew long; tokens are what the GPU bill is denominated
    in, so this is the number that justifies the dedup pipeline and
    names which ingestion feed pays for it.

    Stages are the repo's canonical dedup ones: exact survivors =
    min(doc_id) per text; near drops = distinct higher-id members of
    the df-capped exact-Jaccard pair set, composed LAZILY from
    ``dedup_ngram_jaccard`` (its oracle text spliced by the deferred
    builder; its DataFrame reused via the lazy-import convention).
    Token counts are exact whitespace-split integers computed in the
    scan projection; the save fraction is one integer division.
    Scale: the pair plan is the df-capped inverted index; the rest is
    hash aggregates, an anti-join, and one source-keyed rollup.
    """
    from project_fauna_spark.operators.dedup import dedup_ngram_jaccard

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("toks"),
        "text",
    )
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
    # r12: NO pin.  tagged has exactly one consumer (the rollup below),
    # so the old "persist for a hypothetical future consumer" cache was
    # pure cost: a corpus-length materialization barrier per invocation
    # with zero reuse (guide §5 — cache only when reused).
    tagged = d.join(final_kept, "doc_id", "left").select(
        "source", "toks", F.col("kept").isNotNull().alias("is_kept")
    )
    kept_toks = F.sum(F.when(F.col("is_kept"), F.col("toks")).otherwise(0))
    saved_toks = F.sum(F.when(~F.col("is_kept"), F.col("toks")).otherwise(0))
    return tagged.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs_raw"),
        F.sum("toks").cast("long").alias("tokens_raw"),
        kept_toks.cast("long").alias("tokens_kept"),
        saved_toks.cast("long").alias("tokens_saved"),
        (saved_toks.cast("double") / F.sum("toks")).alias("save_frac"),
    )


# --------------------------------------------------------------------------
# dq_event_order_audit — how out-of-order is the stream, really?
# --------------------------------------------------------------------------


@register(
    "dq_event_order_audit",
    oracle="""
    WITH t AS (
      SELECT event_type,
             epoch_us(ts) AS us,
             MAX(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS run_max
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(CASE WHEN us < run_max THEN 1 END) AS BIGINT)
             AS n_late,
           CAST(COUNT(CASE WHEN us < run_max THEN 1 END) AS DOUBLE)
             / COUNT(*) AS late_frac,
           CAST(MAX(CASE WHEN us < run_max THEN run_max - us END) AS BIGINT)
             AS max_late_us
    FROM t GROUP BY event_type
    """,
)
def dq_event_order_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-order arrival audit: per event type, how many events
    carry a timestamp EARLIER than something the same user already
    emitted (arrival order = event_id), what fraction that is, and the
    worst lateness in exact microseconds.  This is THE input for
    choosing a Structured Streaming watermark
    (``stream_watermark_late_drop`` drops what the watermark excludes;
    this measures what a given delay would have dropped) and for
    validating ingestion pipelines that claim in-order delivery.

    The running maximum is per-user (bounded partitions on the
    high-cardinality key, ordered by the unique event_id — fully
    deterministic), timestamps compare as exact integer microseconds
    (``unix_micros`` ≡ ``epoch_us`` under the ``io.load_table``
    session-UTC normalization), and the only float is the one
    late-fraction division.  Scale: one user-keyed window + one
    map-combined rollup over the handful of event types.
    """
    w = (
        W.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    us = F.expr("unix_micros(ts)")
    t = load_table(spark, sf_dir, "events").select(
        "event_type",
        us.alias("us"),
        F.max(us).over(w).alias("run_max"),
    )
    late = F.col("us") < F.col("run_max")
    return t.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.count(F.when(late, 1)).cast("long").alias("n_late"),
        (F.count(F.when(late, 1)).cast("double") / F.count("*")).alias(
            "late_frac"
        ),
        F.max(F.when(late, F.col("run_max") - F.col("us")))
        .cast("long")
        .alias("max_late_us"),
    )
