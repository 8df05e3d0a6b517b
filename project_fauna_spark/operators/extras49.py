"""Round-6 batch 43: hapax legomena rates and near-dup component-size
distribution.

Registered AFTER the round-6 grading window block (plans/__init__) —
new registrations must never perturb the first-50 window the driver
grades (pinned by tests/test_window_manifest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from project_fauna_spark.cache import cached
from project_fauna_spark.io import load_table
from project_fauna_spark.plans.registry import register

# --------------------------------------------------------------------------
# text_hapax_rate — how much of the vocabulary occurs exactly once?
# --------------------------------------------------------------------------


@register(
    "text_hapax_rate",
    oracle="""
    WITH tc AS (
      SELECT lang, term, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT lang, unnest(string_split(text, ' ')) AS term
            FROM documents)
      GROUP BY 1, 2
    )
    SELECT lang,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_vocab,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS hapax_vocab_share,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(SUM(c) AS DOUBLE) AS hapax_token_share
    FROM tc GROUP BY lang
    """,
)
def text_hapax_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax legomena profile per language: how much of the
    vocabulary — and of the token stream — is words that occur
    exactly ONCE.  A high hapax share means an open, productive
    vocabulary (or OCR noise / tokenization damage); a collapsing one
    means templated text — the corpus-health dial lexicographers and
    tokenizer trainers both read first
    (``text_heaps_diagnostic`` correlates length with vocabulary;
    hapax measures the UNSEEN-mass frontier directly, and is the
    numerator of the Good–Turing unseen-probability estimate).

    One map-combined (lang, term) count aggregate; both shares are
    single IEEE divisions of exact integers.  Scale: the only
    data-sized shuffle is term-keyed; the output is |langs| rows.
    """
    tc = (
        load_table(spark, sf_dir, "documents")
        .select("lang", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("lang", "term")
        .agg(F.count("*").alias("c"))
    )
    hapax = F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
    return tc.groupBy("lang").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_vocab"),
        hapax.cast("long").alias("n_hapax"),
        (hapax.cast("double") / F.count("*").cast("double")).alias(
            "hapax_vocab_share"
        ),
        (hapax.cast("double") / F.sum("c").cast("double")).alias(
            "hapax_token_share"
        ),
    )


# --------------------------------------------------------------------------
# dedup_component_size_histogram — the near-dup cluster-size shape
# --------------------------------------------------------------------------


def _component_histogram_oracle() -> str:
    from project_fauna_spark.operators._oracle_shared import SQL_CC_COMPONENTS

    return f"""
    WITH cc AS (SELECT * FROM ({SQL_CC_COMPONENTS}) _cc),
    sizes AS (
      SELECT component_id, CAST(COUNT(*) AS BIGINT) AS sz
      FROM cc GROUP BY 1
    )
    SELECT CAST(sz AS BIGINT) AS component_size,
           CAST(COUNT(*) AS BIGINT) AS n_components,
           CAST(sz * COUNT(*) AS BIGINT) AS n_docs
    FROM sizes GROUP BY sz
    """


@register(
    "dedup_component_size_histogram", oracle_builder=_component_histogram_oracle
)
def dedup_component_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size distribution of the NEAR-dup connected components — the
    near-duplicate twin of ``dedup_family_size_histogram`` (which
    counts EXACT-duplicate families): singletons are unique content,
    a long tail of pairs means borderline paraphrases, and a few
    giant components mean template farms whose removal changes corpus
    statistics materially.  Together the two histograms are the
    before/after picture every dedup design review starts from.

    Composes ``dedup_connected_components`` (lazy import — the
    extras4 cross-reuse convention) and its shared oracle SQL
    (deferred builder over ``_oracle_shared.SQL_CC_COMPONENTS``), so
    the histogram can never disagree with the clustering it
    summarizes.  Two tiny aggregates on top of the component table.
    """
    from project_fauna_spark.operators.dedup import dedup_connected_components

    cc = dedup_connected_components(spark, sf_dir)
    sizes = cc.groupBy("component_id").agg(F.count("*").alias("sz"))
    return (
        sizes.groupBy("sz")
        .agg(F.count("*").alias("n_components"))
        .select(
            F.col("sz").cast("long").alias("component_size"),
            F.col("n_components").cast("long").alias("n_components"),
            (F.col("sz") * F.col("n_components")).cast("long").alias("n_docs"),
        )
    )
