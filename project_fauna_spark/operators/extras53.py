"""Round-7 batch 1: incremental-batch dedup and importance resampling.

Two production LLM-training-pipeline shapes the registry did not yet
have as first-class queries (registered post-window; graded r9 per the
drain schedule):

* ``dedup_incremental_new_batch`` — the DAILY-INGEST dedup shape: a
  new batch of documents arrives and each new doc is kept only if it
  is not a near-duplicate of the existing corpus or an earlier doc in
  the same batch.  Production dedup is incremental far more often than
  it is one-shot; the one-shot pair machinery (``dedup_ngram_jaccard``)
  is reused as the candidate/verify stage.
* ``llm_importance_resampling`` — DSIR-style acceptance sampling:
  accept each doc with probability equal to a per-doc quality weight,
  decided by a deterministic salted-hash uniform so the sample is
  REPLAYABLE (same corpus → same sample, any cluster size, no RNG
  state).  Hash-thresholded Bernoulli acceptance is how importance
  resampling actually ships at 100 TB — `rand()` is not reproducible
  across retries/stragglers.

Scale design (100 TB): the incremental shape adds one scalar split
aggregate (1-row broadcast) and one keys-only left join on top of the
existing df-capped inverted-index pair pass — no new shuffle over raw
text; resampling is a single narrow map (hash fold + two integer
counts per doc), no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from project_fauna_spark.functions.wordhash import h32
from project_fauna_spark.io import load_table
from project_fauna_spark.operators._oracle_shared import sql_h32
from project_fauna_spark.plans.registry import register


def _incremental_oracle() -> str:
    from project_fauna_spark.plans.registry import ORACLE

    pairs_sql = ORACLE["dedup_ngram_jaccard"]
    return f"""
    WITH split AS (SELECT (4 * MAX(doc_id)) // 5 AS s FROM documents),
    pairs AS ({pairs_sql}),
    blame AS (
      SELECT doc_b AS doc_id, MIN(doc_a) AS blame_doc
      FROM pairs GROUP BY doc_b
    )
    SELECT d.doc_id,
           b.blame_doc IS NULL AS keep,
           b.blame_doc,
           b.blame_doc <= split.s AS blame_in_corpus
    FROM documents d CROSS JOIN split
    LEFT JOIN blame b ON b.doc_id = d.doc_id
    WHERE d.doc_id > split.s
    """


@register("dedup_incremental_new_batch", oracle_builder=_incremental_oracle)
def dedup_incremental_new_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup of a new document batch against the corpus.

    The corpus is split at the 80th doc_id percentile (integer
    arithmetic, exact on both engines): docs above the split are "the
    new batch".  A new doc is kept iff it has no exact-Jaccard ≥ 0.5
    near-duplicate with a SMALLER doc_id — first-occurrence-wins in
    ingest order, the standard greedy approximation (a doc dropped as
    a dup of an earlier dup still blocks later members of its family,
    which keeps the decision per-pair and shuffle-local instead of
    iterative).  ``blame_in_corpus`` distinguishes dup-of-existing
    from dup-within-batch — the split drives different pipeline
    actions (skip ingest vs intra-batch collapse).

    Reuses the df-capped inverted-index pair pass (dedup.py:121 —
    candidates bounded by shared rare shingles, exact verify on
    survivors only; pairs always have doc_a < doc_b so "earlier dup"
    is exactly a blame join on doc_b).  Cost on top of the pair pass:
    one scalar max aggregate and one ids-only left join.
    """
    from project_fauna_spark.operators.dedup import dedup_ngram_jaccard

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    split = d.agg(
        F.expr("(4 * MAX(doc_id)) div 5").cast("long").alias("s")
    )
    pairs = dedup_ngram_jaccard(spark, sf_dir)
    blame = pairs.groupBy(F.col("doc_b").alias("doc_id")).agg(
        F.min("doc_a").alias("blame_doc")
    )
    return (
        d.crossJoin(F.broadcast(split))
        .filter(F.col("doc_id") > F.col("s"))
        .join(blame, "doc_id", "left")
        .select(
            "doc_id",
            F.col("blame_doc").isNull().alias("keep"),
            "blame_doc",
            (F.col("blame_doc") <= F.col("s")).alias("blame_in_corpus"),
        )
    )


@register(
    "llm_importance_resampling",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS nt,
             len(list_distinct(string_split(text, ' '))) AS nd
      FROM documents
    )
    SELECT doc_id,
           CAST(nt AS BIGINT) AS n_tokens,
           CAST(nd AS DOUBLE) / CAST(nt AS DOUBLE) AS weight,
           ({sql_h32('CAST(doc_id AS VARCHAR)', 'isr:')} / 4294967296.0)
             < (CAST(nd AS DOUBLE) / CAST(nt AS DOUBLE)) AS keep
    FROM t
    """,
)
def llm_importance_resampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance resampling with replayable acceptance.

    Per doc: weight = type-token ratio (distinct words / words — the
    cheap quality proxy; any per-doc importance weight slots in), and
    accept iff a salted 32-bit md5-fold uniform u = h/2^32 ∈ [0,1) is
    below the weight.  E[sample] follows the weight distribution and
    the decision is a pure function of (doc_id, salt): re-running a
    failed partition — or the whole 100 TB job — reproduces the exact
    sample, unlike ``rand()`` whose per-task seeds change under retry
    and straggler re-execution.

    Float parity: weight is one IEEE division of two exact integers
    (identical rounding in both engines); u is an exactly-representable
    dyadic k/2^32 — the comparison is deterministic cross-engine.
    Plan: a single narrow map over the scan, zero shuffles.
    """
    d = load_table(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), " ")
    nt = F.size(ws).cast("long")
    nd = F.size(F.array_distinct(ws)).cast("long")
    w = nd.cast("double") / nt.cast("double")
    u = h32(F.col("doc_id").cast("string"), "isr:") / F.lit(4294967296.0)
    return d.select(
        "doc_id",
        nt.alias("n_tokens"),
        w.alias("weight"),
        (u < w).alias("keep"),
    )
