"""Round-6 batch 45: sampling-error audit and habitual-hour profiling.

Registered AFTER the round-6 grading window block (plans/__init__) —
new registrations must never perturb the first-50 window the driver
grades (pinned by tests/test_window_manifest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from project_fauna_spark.cache import cached
from project_fauna_spark.io import load_table
from project_fauna_spark.plans.registry import register, sql_dsum

# --------------------------------------------------------------------------
# sample_estimate_accuracy — can you trust the 10 % sample?
# --------------------------------------------------------------------------


def _sample_accuracy_oracle() -> str:
    from project_fauna_spark.operators._oracle_shared import sql_h32 as _sql_h32

    h = _sql_h32("CAST(l_orderkey AS VARCHAR) || '_' || CAST(l_linenumber AS VARCHAR)", "acc:")
    return f"""
    WITH t AS (
      SELECT CAST(l_quantity AS BIGINT) AS qty,
             l_extendedprice * (1 - l_discount) AS rev,
             {h} % 10 = 0 AS sampled
      FROM lineitem
    ),
    a AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CASE WHEN sampled THEN 1 ELSE 0 END) AS BIGINT)
               AS n_sampled,
             CAST(SUM(qty) AS BIGINT) AS exact_qty,
             CAST(10 * SUM(CASE WHEN sampled THEN qty ELSE 0 END) AS BIGINT)
               AS est_qty,
             {sql_dsum('rev', 30, 8)} AS exact_rev,
             10 * {sql_dsum('CASE WHEN sampled THEN rev ELSE 0 END', 30, 8)}
               AS est_rev
      FROM t
    )
    SELECT n_rows, n_sampled, exact_qty, est_qty,
           CAST(est_qty AS DOUBLE) / CAST(exact_qty AS DOUBLE) - 1
             AS qty_rel_error,
           exact_rev, est_rev,
           est_rev / exact_rev - 1 AS rev_rel_error
    FROM a
    """


@register("sample_estimate_accuracy", oracle_builder=_sample_accuracy_oracle)
def sample_estimate_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Honest sampling-error audit: a deterministic 1-in-10 hash
    sample of lineitem, its scaled-up quantity and revenue estimates,
    and the ACTUAL relative errors against the exact totals — the
    number that tells an analyst whether "run it on the sample" is
    safe for this metric (``sample_bernoulli`` produces samples; this
    closes the loop by MEASURING what a sample-based estimate would
    have gotten wrong, which is how sampling rates get chosen).

    The sample membership is the portable md5 fold of the full line
    key, so both engines (and every rerun) sample identical rows;
    est = 10× the sampled sum stays exact (integer / decimal), and
    each relative error is ONE division of bit-equal edges.  Scale:
    one map-combined aggregate computes exact AND sampled accumulators
    together — the audit costs the same scan the estimate does.
    """
    from project_fauna_spark.functions.wordhash import h32 as _h32

    key = F.concat(
        F.col("l_orderkey").cast("string"),
        F.lit("_"),
        F.col("l_linenumber").cast("string"),
    )
    t = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("qty"),
        (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias("rev"),
        (_h32(key, "acc:") % 10 == 0).alias("sampled"),
    )
    drev = F.col("rev").cast("decimal(30,8)")
    a = t.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("sampled"), 1).otherwise(0)).cast("long").alias(
            "n_sampled"
        ),
        F.sum("qty").alias("exact_qty"),
        (F.lit(10) * F.sum(F.when(F.col("sampled"), F.col("qty")).otherwise(0)))
        .cast("long")
        .alias("est_qty"),
        F.sum(drev).cast("double").alias("exact_rev"),
        (
            F.lit(10)
            * F.sum(F.when(F.col("sampled"), drev).otherwise(F.lit(0).cast("decimal(30,8)"))).cast(
                "double"
            )
        ).alias("est_rev"),
    )
    return a.select(
        "n_rows",
        "n_sampled",
        "exact_qty",
        "est_qty",
        (
            F.col("est_qty").cast("double") / F.col("exact_qty").cast("double")
            - 1
        ).alias("qty_rel_error"),
        "exact_rev",
        "est_rev",
        (F.col("est_rev") / F.col("exact_rev") - 1).alias("rev_rel_error"),
    )


# --------------------------------------------------------------------------
# event_habit_hour — when is each user's habitual hour?
# --------------------------------------------------------------------------


@register(
    "event_habit_hour",
    oracle="""
    WITH uh AS (
      SELECT user_id, CAST(hour(ts) AS BIGINT) AS h,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT user_id, CAST(SUM(c) AS BIGINT) AS n FROM uh GROUP BY 1),
    modal AS (
      SELECT uh.user_id,
             MAX(struct_pack(c := uh.c, nh := -uh.h)).nh * -1 AS modal_hour,
             MAX(struct_pack(c := uh.c, nh := -uh.h)).c AS modal_c
      FROM uh GROUP BY uh.user_id
    )
    SELECT m.modal_hour,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(CAST(SUM(CAST(CAST(CAST(m.modal_c AS DOUBLE) / t.n AS VARCHAR)
                              AS DECIMAL(30,12))) AS VARCHAR) AS DOUBLE)
             / COUNT(*) AS mean_concentration
    FROM modal m JOIN tot t USING (user_id)
    GROUP BY m.modal_hour
    """,
)
def event_habit_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Habitual-hour profile: each user's MODAL activity hour (the
    struct-argmax with a smallest-hour tie-break) and how concentrated
    their activity is in it, rolled up as a distribution over users —
    the send-time-optimization / staffing input that the global
    ``ts_dow_hour_heatmap`` hides, because an even aggregate curve can
    be many sharply-peaked users in different hours.

    Modal hour is an order-independent lexicographic struct MAX; each
    user's concentration is ONE division of exact integers; the mean
    concentration per modal hour re-enters decimal (the only
    cross-row float sum).  Scale: one (user, hour) aggregate, one
    user-keyed argmax, a ≤24-row result.
    """
    uh = cached(
        load_table(spark, sf_dir, "events")
        .select("user_id", F.hour("ts").cast("long").alias("h"))
        .groupBy("user_id", "h")
        .agg(F.count("*").alias("c"))
    )
    tot = uh.groupBy("user_id").agg(F.sum("c").alias("n"))
    best = F.max(
        F.struct(F.col("c").alias("c"), (-F.col("h")).alias("nh"))
    )
    modal = uh.groupBy("user_id").agg(best.alias("b")).select(
        "user_id",
        (F.col("b.nh") * -1).alias("modal_hour"),
        F.col("b.c").alias("modal_c"),
    )
    share = F.col("modal_c").cast("double") / F.col("n")
    return (
        modal.join(tot, "user_id")
        .select("modal_hour", share.alias("share"))
        .groupBy("modal_hour")
        .agg(
            F.count("*").alias("n_users"),
            (
                F.sum(F.col("share").cast("decimal(30,12)")).cast("double")
                / F.count("*")
            ).alias("mean_concentration"),
        )
    )
