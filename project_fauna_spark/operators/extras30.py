"""Round-6 batch 24: the discount demand curve.

(``ts_max_drawdown`` moved home to ``timeseries.py`` at the round-9
rotation after its round-8 grade, the moved-home convention — exact
query text unchanged, only the module.)

Registered AFTER the round-6 grading window block (plans/__init__) —
new registrations must never perturb the first-50 window the driver
grades (pinned by tests/test_window_manifest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from project_fauna_spark.io import load_table
from project_fauna_spark.plans.registry import dsum, register, sql_dsum

# --------------------------------------------------------------------------
# q_discount_demand_curve — does discounting actually move volume?
# --------------------------------------------------------------------------


@register(
    "q_discount_demand_curve",
    oracle=f"""
    SELECT CAST(ROUND(l_discount * 100) AS BIGINT) AS discount_pct,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*)
             AS avg_qty,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 30, 8)} AS revenue
    FROM lineitem
    GROUP BY 1
    """,
)
def q_discount_demand_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Demand curve across the discount ladder: for each discount
    level (0–10 %), line count, total and mean quantity, and the
    realized discounted revenue — the pricing-analytics readout that
    says whether deeper discounts buy bigger baskets
    (``q_promo_revenue`` measures promo share; this resolves volume
    response BY discount level).

    The discount bucket is ``round(l_discount·100)`` — both engines
    round the SAME stored double, so near-integer inputs bucket
    identically.  Quantities are integer-valued doubles cast to
    BIGINT (exact); ``avg_qty`` is one IEEE division of exact
    integers; revenue uses the decimal-accumulate convention
    (VARCHAR-routed in the oracle).  Scale: ONE map-combined
    aggregate over lineitem into an 11-key frame — no shuffle wider
    than the discount domain.
    """
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("long")
    return (
        li.groupBy(
            F.round(F.col("l_discount") * 100)
            .cast("long")
            .alias("discount_pct")
        )
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(qty).alias("total_qty"),
            (F.sum(qty).cast("double") / F.count("*")).alias("avg_qty"),
            dsum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
            ).alias("revenue"),
        )
    )
