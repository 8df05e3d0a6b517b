"""Round-6 batch 13: customer reorder cadence, Holt linear-trend
forecasting, and an order-backlog aging report.

Registered AFTER the round-6 grading window block (plans/__init__) —
new registrations must never perturb the first-50 window the driver
grades (pinned by tests/test_window_manifest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from project_fauna_spark.io import load_table
from project_fauna_spark.plans.registry import (
    davg,
    dsum,
    register,
    sql_davg,
    sql_dsum,
)

# --------------------------------------------------------------------------
# q_customer_reorder_gap — reorder-interval profile per market segment
# --------------------------------------------------------------------------


@register(
    "q_customer_reorder_gap",
    oracle=f"""
    WITH g AS (
      SELECT o_custkey,
             date_diff('day',
               LAG(CAST(o_orderdate AS DATE)) OVER (
                 PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)),
               CAST(o_orderdate AS DATE)) AS gap
      FROM orders
    )
    SELECT c.c_mktsegment,
           CAST(COUNT(DISTINCT g.o_custkey) AS BIGINT) AS n_customers,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           {sql_davg('g.gap')} AS avg_gap_days,
           CAST(MAX(g.gap) AS BIGINT) AS max_gap_days
    FROM g JOIN customer c ON c.c_custkey = g.o_custkey
    WHERE g.gap IS NOT NULL
    GROUP BY 1
    """,
)
def q_customer_reorder_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reorder cadence per market segment: the day gaps between each
    customer's CONSECUTIVE orders, rolled up to segment-level repeat
    customers, gap counts, mean and worst-case reorder intervals —
    the purchase-frequency profile behind replenishment forecasts and
    churn-risk windows (a segment whose mean gap stretches is
    disengaging).

    The lag window partitions by ``o_custkey`` — a HIGH-cardinality
    key (~10 orders/customer), so per-partition state is bounded at
    any scale, and ties on the order date are harmless: the multiset
    of consecutive differences of a sorted multiset is the same under
    any tie order (equal dates contribute zero gaps).  The customer
    join shuffles on the same custkey the window just partitioned by,
    so the sort/exchange is reused, then one segment-keyed aggregate.
    Gaps are exact integer days; the mean is decimal-accumulated
    (``davg``).
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.to_date("o_orderdate").alias("od")
    )
    w = W.partitionBy("o_custkey").orderBy("od")
    gaps = (
        o.withColumn("prev", F.lag("od").over(w))
        .filter(F.col("prev").isNotNull())
        .select("o_custkey", F.datediff("od", "prev").alias("gap"))
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    return (
        gaps.join(c, gaps.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count("*").alias("n_gaps"),
            davg(F.col("gap")).alias("avg_gap_days"),
            F.max("gap").cast("long").alias("max_gap_days"),
        )
        .select(
            "c_mktsegment",
            F.col("n_customers").cast("long").alias("n_customers"),
            F.col("n_gaps").cast("long").alias("n_gaps"),
            "avg_gap_days",
            "max_gap_days",
        )
    )


# --------------------------------------------------------------------------
# ts_holt_linear_forecast — level+trend smoothing, bit-exact fold replay
# --------------------------------------------------------------------------

_HOLT_HORIZON = 7


@register(
    "ts_holt_linear_forecast",
    oracle=f"""
    WITH RECURSIVE daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    ord AS (
      SELECT n, ROW_NUMBER() OVER (ORDER BY day) AS t FROM daily
    ),
    s(t, l, b) AS (
      SELECT t, CAST(n AS DOUBLE), CAST(0.0 AS DOUBLE) FROM ord WHERE t = 1
      UNION ALL
      SELECT o.t,
             (CAST(o.n AS DOUBLE) + (s.l + s.b)) / 2,
             (((CAST(o.n AS DOUBLE) + (s.l + s.b)) / 2 - s.l) + s.b) / 2
      FROM s JOIN ord o ON o.t = s.t + 1
    ),
    fin AS (SELECT t, l, b FROM s ORDER BY t DESC LIMIT 1),
    h(h) AS (VALUES {", ".join(f"({k})" for k in range(1, _HOLT_HORIZON + 1))})
    SELECT CAST(h.h AS BIGINT) AS h,
           CAST(fin.t AS BIGINT) AS n_days,
           fin.l AS level,
           fin.b AS trend,
           fin.l + h.h * fin.b AS forecast
    FROM h CROSS JOIN fin
    """,
)
def ts_holt_linear_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend exponential smoothing of the daily event
    count (α = β = ½) with a 1–7-day-ahead forecast ŷ(h) = ℓ + h·b —
    the trend-aware upgrade of ``ts_ewma_bounded`` (which tracks level
    only) and the model-based counterpart of
    ``ts_seasonal_naive_backtest``.  Init ℓ₁ = y₁, b₁ = 0.

    The recursion ℓₜ = (yₜ + (ℓ+b))/2, bₜ = ((ℓₜ−ℓ)+b)/2 compounds
    floats, so cross-engine equality comes from REPLAYING THE
    IDENTICAL OPERATION SEQUENCE, not from exactness: Spark folds the
    day-sorted array left-to-right (``F.aggregate``) and the oracle's
    recursive CTE performs the same adds/divides in the same order —
    the ``event_survival_km`` index-ordered-fold convention.  The
    smoothing constants are dyadic (÷2), keeping early iterates exact
    and later ones merely identical.  Scale: one map-combined daily
    aggregate; the fold runs on the calendar-bounded series (≤ a few
    thousand elements at any SF), never on raw rows.
    """
    daily = (
        load_table(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("day"))
        .groupBy("day")
        .agg(F.count("*").alias("n"))
    )
    arr = daily.agg(
        F.sort_array(F.collect_list(F.struct("day", "n"))).alias("ys")
    )

    def _step(acc, x):  # noqa: ANN001 — HOF lambda: touches acc + element only
        y = x.getField("n").cast("double")
        first = acc.getField("t") == 0
        l_new = F.when(first, y).otherwise(
            (y + (acc.getField("l") + acc.getField("b"))) / F.lit(2)
        )
        b_new = F.when(first, F.lit(0.0)).otherwise(
            ((l_new - acc.getField("l")) + acc.getField("b")) / F.lit(2)
        )
        return F.struct(
            (acc.getField("t") + F.lit(1)).cast("long").alias("t"),
            l_new.alias("l"),
            b_new.alias("b"),
        )

    init = F.struct(
        F.lit(0).cast("long").alias("t"),
        F.lit(0.0).alias("l"),
        F.lit(0.0).alias("b"),
    )
    fin = arr.select(F.aggregate(F.col("ys"), init, _step).alias("s")).select(
        F.col("s.t").alias("n_days"),
        F.col("s.l").alias("level"),
        F.col("s.b").alias("trend"),
    )
    return (
        fin.filter(F.col("n_days") > 0)
        .select(
            F.explode(
                F.sequence(F.lit(1), F.lit(_HOLT_HORIZON))
            ).alias("h_i"),
            "n_days",
            "level",
            "trend",
        )
        .select(
            F.col("h_i").cast("long").alias("h"),
            "n_days",
            "level",
            "trend",
            (F.col("level") + F.col("h_i") * F.col("trend")).alias("forecast"),
        )
    )


# --------------------------------------------------------------------------
# q_orders_backlog_aging — open-order aging buckets with value at risk
# --------------------------------------------------------------------------


@register(
    "q_orders_backlog_aging",
    oracle=f"""
    WITH mx AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS asof FROM orders),
    open_o AS (
      SELECT date_diff('day', CAST(o_orderdate AS DATE), mx.asof) AS age,
             o_totalprice
      FROM orders CROSS JOIN mx
      WHERE o_orderstatus IN ('O', 'P')
    )
    SELECT CASE WHEN age <= 30 THEN '00-30d'
                WHEN age <= 90 THEN '31-90d'
                WHEN age <= 365 THEN '91-365d'
                ELSE '365d+' END AS age_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {sql_dsum('o_totalprice')} AS open_value,
           {sql_davg('age')} AS avg_age_days,
           CAST(MAX(age) AS BIGINT) AS max_age_days
    FROM open_o GROUP BY 1
    """,
)
def q_orders_backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog aging: every not-yet-finished order
    (status 'O' or 'P') bucketed by days outstanding relative to the
    newest order date in the data, with order counts, the decimal-
    exact dollar value tied up per bucket, and mean/worst ages — the
    operations report that says where fulfillment is stalling and how
    much revenue is at risk in the long tail.

    The as-of anchor is a 1-row broadcast (MAX over the full table —
    computed on all statuses so the report is stable as orders
    close).  Ages are exact integer days; bucket labels are a pure
    CASE; the value sum is decimal-accumulated (``dsum``) so the
    double edge is order-independent.  Scale: one scan + one
    4-bucket-keyed map-combined aggregate; no joins, no windows.
    """
    o = load_table(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("od"),
        "o_orderstatus",
        "o_totalprice",
    )
    mx = o.agg(F.max("od").alias("asof"))
    age = F.datediff(F.col("asof"), F.col("od"))
    bucket = (
        F.when(age <= 30, "00-30d")
        .when(age <= 90, "31-90d")
        .when(age <= 365, "91-365d")
        .otherwise("365d+")
    )
    return (
        o.filter(F.col("o_orderstatus").isin("O", "P"))
        .crossJoin(F.broadcast(mx))
        .select(
            bucket.alias("age_bucket"),
            age.alias("age"),
            "o_totalprice",
        )
        .groupBy("age_bucket")
        .agg(
            F.count("*").alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("open_value"),
            davg(F.col("age")).alias("avg_age_days"),
            F.max("age").cast("long").alias("max_age_days"),
        )
        .select(
            "age_bucket",
            F.col("n_orders").cast("long").alias("n_orders"),
            "open_value",
            "avg_age_days",
            "max_age_days",
        )
    )
