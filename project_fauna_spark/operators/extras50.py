"""Round-6 batch 44: group-aware event splitting and brand return-rate
error bars.

Registered AFTER the round-6 grading window block (plans/__init__) —
new registrations must never perturb the first-50 window the driver
grades (pinned by tests/test_window_manifest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from project_fauna_spark.io import load_table
from project_fauna_spark.plans.registry import register

# --------------------------------------------------------------------------
# ml_group_aware_split — split by USER, never by row
# --------------------------------------------------------------------------


def _group_split_oracle() -> str:
    from project_fauna_spark.operators._oracle_shared import sql_h32 as _sql_h32

    h = _sql_h32("CAST(user_id AS VARCHAR)", "grp:")
    return f"""
    WITH e AS (
      SELECT user_id, event_type,
             CASE WHEN {h} % 10 <= 7 THEN 'train'
                  WHEN {h} % 10 = 8 THEN 'val'
                  ELSE 'test' END AS split
      FROM events
    )
    SELECT split,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
                AS BIGINT) AS n_purchases,
           CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
                AS DOUBLE) / COUNT(*) AS purchase_rate
    FROM e GROUP BY split
    """


@register("ml_group_aware_split", oracle_builder=_group_split_oracle)
def ml_group_aware_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP-aware train/val/test split of the event stream: every
    USER hashes wholly into one split (8/1/1 by the portable md5
    fold), so no user's behavior leaks across the boundary — the
    split rule sequence models and churn predictors require, and the
    one a row-level split (``llm_train_val_split`` splits independent
    documents, where row-level is correct) silently violates.  Per
    split: user and event counts plus the purchase-rate balance check
    that says whether the label distribution survived the split.

    Deterministic and engine-portable: the assignment is a pure hash
    of the group key, so re-runs, backfills, and late events land in
    the same split forever.  Scale: one expression-level assignment +
    one map-combined aggregate; no shuffle carries more than
    (split, counts).
    """
    from project_fauna_spark.functions.wordhash import h32 as _h32

    h = _h32(F.col("user_id").cast("string"), "grp:") % 10
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.when(h <= 7, "train").when(h == 8, "val").otherwise("test").alias(
            "split"
        ),
    )
    purchases = F.count(F.when(F.col("event_type") == "purchase", 1))
    return e.groupBy("split").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
        purchases.cast("long").alias("n_purchases"),
        (purchases.cast("double") / F.count("*")).alias("purchase_rate"),
    )


# --------------------------------------------------------------------------
# q_brand_return_rate — which brands come back, with honest error bars
# --------------------------------------------------------------------------


def _brand_return_oracle() -> str:
    from project_fauna_spark.operators.extras25 import _WILSON_HI, _WILSON_LO

    return f"""
    WITH b AS (
      SELECT p.p_brand,
             CAST(COUNT(CASE WHEN l.l_returnflag = 'R' THEN 1 END)
                  AS BIGINT) AS k,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1
    )
    SELECT p_brand, k AS n_returned, n AS n_lines,
           CAST(k AS DOUBLE) / n AS return_rate,
           {_WILSON_LO} AS ci_low,
           {_WILSON_HI} AS ci_high
    FROM b WHERE n > 0
    """


@register("q_brand_return_rate", oracle_builder=_brand_return_oracle)
def q_brand_return_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Return rate per part brand with 95 % Wilson score bounds — the
    merchandising quality scoreboard where the ERROR BAR is the
    point: a 40 % rate on 12 lines must not outrank a 30 % rate on
    40 000 lines, and comparing ci_low does that ordering honestly
    (``q_returned_items`` totals the returned revenue;
    ``ts_conversion_wilson_ci`` is the same interval on the daily
    conversion series — this reuses its verbatim-shared expression
    strings, so the interval arithmetic cannot fork).

    k and n are exact integer counts from one partkey-colocatable
    join + brand aggregate; the Wilson bounds are the identical
    double expression tree in both engines (scientific-notation
    literals — see the extras25 typing note), bit-equal with no
    decimal routing.
    """
    from project_fauna_spark.operators.extras25 import _WILSON_HI, _WILSON_LO

    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_returnflag")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    b = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.when(F.col("l_returnflag") == "R", 1))
            .cast("long")
            .alias("k"),
            F.count("*").alias("n"),
        )
        .filter(F.col("n") > 0)
    )
    return b.select(
        "p_brand",
        F.col("k").alias("n_returned"),
        F.col("n").alias("n_lines"),
        (F.col("k").cast("double") / F.col("n")).alias("return_rate"),
        F.expr(_WILSON_LO).alias("ci_low"),
        F.expr(_WILSON_HI).alias("ci_high"),
    )
