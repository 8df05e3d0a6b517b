"""Round-6 batch 30: first-purchase LTV correlation and the language-ID
confusion matrix.

Registered AFTER the round-6 grading window block (plans/__init__) —
new registrations must never perturb the first-50 window the driver
grades (pinned by tests/test_window_manifest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from project_fauna_spark.cache import cached
from project_fauna_spark.functions.moments import int_pearson_moments, pearson_terms
from project_fauna_spark.io import load_table
from project_fauna_spark.plans.registry import register

# --------------------------------------------------------------------------
# ml_first_order_ltv_corr — does the first basket predict the customer?
# --------------------------------------------------------------------------


@register(
    "ml_first_order_ltv_corr",
    oracle="""
    WITH cents AS (
      SELECT o_custkey, o_orderdate, o_orderkey,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
      FROM orders
    ),
    per_cust AS (
      SELECT o_custkey, CAST(SUM(c) AS BIGINT) AS y FROM cents GROUP BY 1
    ),
    first AS (
      SELECT o_custkey, c AS x
      FROM (SELECT o_custkey, c,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey) AS rn
            FROM cents)
      WHERE rn = 1
    ),
    t AS (
      SELECT cu.c_mktsegment, f.x, p.y
      FROM first f
      JOIN per_cust p USING (o_custkey)
      JOIN customer cu ON cu.c_custkey = f.o_custkey
    ),
    m AS (
      SELECT c_mktsegment,
             CAST(COUNT(*) AS HUGEINT) AS np,
             SUM(CAST(x AS HUGEINT)) AS sx,
             SUM(CAST(y AS HUGEINT)) AS sy,
             SUM(CAST(x AS HUGEINT) * y) AS sxy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx,
             SUM(CAST(y AS HUGEINT) * y) AS syy
      FROM t GROUP BY 1
    )
    SELECT c_mktsegment,
           CAST(np AS BIGINT) AS n_customers,
           CAST(CAST(sx AS VARCHAR) AS DOUBLE) / CAST(np AS BIGINT)
             AS mean_first_cents,
           CAST(CAST(sy AS VARCHAR) AS DOUBLE) / CAST(np AS BIGINT)
             AS mean_ltv_cents,
           CASE WHEN np * sxx - sx * sx > 0 AND np * syy - sy * sy > 0
                THEN CAST(CAST(np * sxy - sx * sy AS VARCHAR) AS DOUBLE)
                  / (sqrt(CAST(CAST(np * sxx - sx * sx AS VARCHAR) AS DOUBLE))
                     * sqrt(CAST(CAST(np * syy - sy * sy AS VARCHAR)
                                 AS DOUBLE)))
           END AS first_ltv_corr
    FROM m
    """,
)
def ml_first_order_ltv_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does the FIRST order's value predict the customer's lifetime
    value?  Per market segment: Pearson correlation between
    first-order cents and lifetime cents — the one number that decides
    whether first-basket-based acquisition bidding is defensible
    (``event_cohort_ltv`` tracks the LTV CURVE over time; this scores
    the day-one PREDICTOR).

    Prices become exact integer cents (both engines round the same
    stored doubles), so the five Pearson moments accumulate exactly
    (the ``functions/moments`` contract: decimal(38,0) / HUGEINT) and
    the correlation's only float ops are one division and two
    IEEE-exact sqrts of identical integers.  The first order is
    rank-1 by (date, orderkey) under a custkey-partitioned window —
    high-cardinality key, no funnel.  Means are single divisions of
    exact integers.
    """
    cents = cached(
        load_table(spark, sf_dir, "orders").select(
            "o_custkey",
            "o_orderdate",
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("c"),
        )
    )
    per_cust = cents.groupBy("o_custkey").agg(F.sum("c").alias("y"))
    rn = F.row_number().over(
        W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    )
    first = (
        cents.select("o_custkey", "c", rn.alias("rn"))
        .filter(F.col("rn") == 1)
        .select("o_custkey", F.col("c").alias("x"))
    )
    cu = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    t = (
        first.join(per_cust, "o_custkey")
        .join(cu, first.o_custkey == cu.c_custkey)
        .select("c_mktsegment", "x", "y")
    )
    m = int_pearson_moments(t, ["c_mktsegment"])
    num, dx, dy, corr = pearson_terms()
    return m.select(
        "c_mktsegment",
        F.col("np_l").cast("long").alias("n_customers"),
        (F.col("sx").cast("double") / F.col("np_l")).alias("mean_first_cents"),
        (F.col("sy").cast("double") / F.col("np_l")).alias("mean_ltv_cents"),
        F.when((dx > 0) & (dy > 0), corr).alias("first_ltv_corr"),
    )


# --------------------------------------------------------------------------
# text_langid_confusion — where does the language classifier go wrong?
# --------------------------------------------------------------------------


def _langid_confusion_oracle() -> str:
    from project_fauna_spark.plans.registry import ORACLE

    pred_sql = ORACLE["text_langid_ngram"]
    return f"""
    WITH pred AS ({pred_sql}),
    c AS (
      SELECT actual_lang, guessed_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM pred GROUP BY 1, 2
    ),
    t AS (SELECT actual_lang, CAST(SUM(n_docs) AS BIGINT) AS tot
          FROM c GROUP BY 1)
    SELECT c.actual_lang, c.guessed_lang, c.n_docs,
           CAST(c.n_docs AS DOUBLE) / CAST(t.tot AS DOUBLE) AS row_share
    FROM c JOIN t USING (actual_lang)
    """


@register("text_langid_confusion", oracle_builder=_langid_confusion_oracle)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the language-ID heuristic against the
    labeled ``lang`` column: per (actual, guessed) cell, document
    count and row-normalized share — the standard eval artifact that
    turns ``text_langid_ngram``'s per-doc ``agree`` boolean into
    "WHICH languages bleed into which" (the input to per-language
    threshold tuning and mixture re-weighting in a multilingual
    corpus pipeline).

    Composes the langid query (lazy import — the extras4 cross-reuse
    convention) and its oracle SQL (deferred builder, so registration
    order can't matter).  The matrix is |langs|²-bounded; each row
    share is ONE IEEE division of exact counts.
    """
    from project_fauna_spark.operators.text import text_langid_ngram

    pred = text_langid_ngram(spark, sf_dir).select("actual_lang", "guessed_lang")
    c = pred.groupBy("actual_lang", "guessed_lang").agg(
        F.count("*").alias("n_docs")
    )
    t = c.groupBy("actual_lang").agg(F.sum("n_docs").alias("tot"))
    return (
        c.join(F.broadcast(t), "actual_lang")
        .select(
            "actual_lang",
            "guessed_lang",
            "n_docs",
            (F.col("n_docs").cast("double") / F.col("tot").cast("double")).alias(
                "row_share"
            ),
        )
    )
