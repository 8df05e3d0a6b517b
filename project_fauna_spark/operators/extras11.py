"""Round-6 batch 5: integer-exact CUSUM changepoint detection and
distributed weighted median.

Registered AFTER the round-6 grading window block (plans/__init__) —
new registrations must never perturb the first-50 window the driver
grades (pinned by tests/test_window_manifest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from project_fauna_spark.cache import cached
from project_fauna_spark.io import load_table
from project_fauna_spark.plans.registry import register

# --------------------------------------------------------------------------
# ts_cusum_changepoint — scaled-integer CUSUM level-shift detection
# --------------------------------------------------------------------------


@register(
    "ts_cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             COUNT(*) AS n
      FROM events GROUP BY event_type, CAST(date_trunc('day', ts) AS DATE)
    ),
    tot AS (
      SELECT event_type, COUNT(*) AS nd, SUM(n) AS s1
      FROM daily GROUP BY event_type
    ),
    c AS (
      SELECT d.event_type, d.day, d.n, t.nd, t.s1,
             t.nd * SUM(d.n) OVER (PARTITION BY d.event_type ORDER BY d.day
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - (row_number() OVER (PARTITION BY d.event_type ORDER BY d.day))
                 * t.s1 AS cusum_scaled
      FROM daily d JOIN tot t ON t.event_type = d.event_type
    ),
    best AS (
      SELECT event_type, day AS changepoint_day, cusum_scaled, nd FROM (
        SELECT *, row_number() OVER (PARTITION BY event_type
                                     ORDER BY abs(cusum_scaled) DESC, day) AS rn
        FROM c) WHERE rn = 1
    )
    SELECT event_type,
           strftime(changepoint_day, '%Y-%m-%d') AS changepoint_day,
           CAST(cusum_scaled AS BIGINT) AS cusum_scaled,
           CAST(abs(cusum_scaled) AS DOUBLE) / nd AS max_abs_deviation
    FROM best
    """,
)
def ts_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection over daily event volumes: the day
    where the cumulative deviation from the series mean peaks — the
    classic level-shift locator (did the pipeline's volume regime
    change, and when?), complementing ``dq_control_chart``'s
    point-outlier flags.

    INTEGER-exact by scaling: CUSUM_k = Σᵢ≤ₖ(nᵢ − S₁/N) is multiplied
    through by N to N·Σᵢ≤ₖnᵢ − k·S₁ — a running BIGINT sum times
    integers, so the argmax day is exact in both engines with zero
    float accumulation (the normalized deviation is ONE division at
    the edge).  The argmax tie-breaks on the earlier day.

    Scale: the running sum windows over the DAILY table (one row per
    (type, day) — already aggregated), so the window state is
    calendar-bounded, not data-bounded; the raw-events pass is one
    map-combined count.
    """
    e = load_table(spark, sf_dir, "events").select("event_type", "ts")
    daily = e.groupBy(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.count("*").alias("n"))
    daily = cached(daily)
    tot = daily.groupBy("event_type").agg(
        F.count("*").alias("nd"), F.sum("n").alias("s1")
    )
    w_run = (
        W.partitionBy("event_type").orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_rn = W.partitionBy("event_type").orderBy("day")
    c = (
        daily.join(F.broadcast(tot), "event_type")
        .withColumn("run_sum", F.sum("n").over(w_run))
        .withColumn("k", F.row_number().over(w_rn))
        .withColumn(
            "cusum_scaled", F.col("nd") * F.col("run_sum") - F.col("k") * F.col("s1")
        )
    )
    w_best = W.partitionBy("event_type").orderBy(
        F.abs(F.col("cusum_scaled")).desc(), "day"
    )
    return (
        c.withColumn("rn", F.row_number().over(w_best))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("changepoint_day"),
            F.col("cusum_scaled").cast("long").alias("cusum_scaled"),
            (F.abs(F.col("cusum_scaled")).cast("double") / F.col("nd")).alias(
                "max_abs_deviation"
            ),
        )
    )


# --------------------------------------------------------------------------
# agg_weighted_median — two-phase weighted order statistic
# --------------------------------------------------------------------------

_WM_BUCKET = 1000.0  # price-range bucket width for the two-phase rank


@register(
    "agg_weighted_median",
    oracle="""
    WITH li AS (
      SELECT l_returnflag, l_extendedprice, l_orderkey, l_linenumber,
             CAST(floor(l_quantity) AS BIGINT) AS w
      FROM lineitem
    ),
    tot AS (
      SELECT l_returnflag, SUM(w) AS total_w FROM li GROUP BY l_returnflag
    ),
    r AS (
      SELECT li.l_returnflag, li.l_extendedprice, t.total_w,
             SUM(li.w) OVER (PARTITION BY li.l_returnflag
                             ORDER BY li.l_extendedprice, li.l_orderkey,
                                      li.l_linenumber
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS run_w
      FROM li JOIN tot t ON t.l_returnflag = li.l_returnflag
    ),
    sel AS (
      SELECT l_returnflag, total_w,
             MIN(l_extendedprice) FILTER (WHERE run_w * 2 >= total_w)
               AS weighted_median_price
      FROM r GROUP BY l_returnflag, total_w
    )
    SELECT l_returnflag, CAST(total_w AS BIGINT) AS total_weight,
           weighted_median_price
    FROM sel
    """,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median: the extended price at which the running
    quantity-weight first reaches half the group's total — the robust
    'typical price per unit sold' statistic (an unweighted median
    over-counts small orders).

    Weights are exact integers (quantities are integral-valued); the
    crossing test is the integer inequality ``2·run_w ≥ total_w``, and
    the selected value is a MIN over qualifying prices — so the result
    is exact with zero float accumulation.

    The running weight never uses a bare ``PARTITION BY returnflag``
    window (3-partition funnel): local running weights within
    (flag, price-bucket) sub-windows plus a broadcast per-bucket
    offset table reproduce the global running weight exactly — the
    repo's two-phase rank generalized to weighted rank.  The oracle
    uses the single-window spelling; outputs are identical integers.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_extendedprice",
        "l_orderkey",
        "l_linenumber",
        # floor() in BOTH engines: Spark's double->long cast truncates
        # while DuckDB's CAST(double AS BIGINT) rounds — a fractional
        # quantity in regenerated testdata would silently diverge the
        # weights (code-review r6).  floor agrees everywhere.
        F.floor(F.col("l_quantity")).cast("long").alias("w"),
    )
    bucketed = li.withColumn(
        "bkt", F.floor(F.col("l_extendedprice") / F.lit(_WM_BUCKET)).cast("long")
    )
    bucketed = cached(bucketed)
    w_local = W.partitionBy("l_returnflag", "bkt").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    ).rowsBetween(W.unboundedPreceding, W.currentRow)
    local = bucketed.withColumn("local_w", F.sum("w").over(w_local))
    from project_fauna_spark.functions.ranks import bucket_offsets

    offsets = bucket_offsets(
        bucketed, ["l_returnflag"], "bkt", F.col("w"), total_alias="total_w"
    )
    r = local.join(F.broadcast(offsets), ["l_returnflag", "bkt"]).withColumn(
        "run_w", F.col("offset") + F.col("local_w")
    )
    return (
        r.filter(F.col("run_w") * 2 >= F.col("total_w"))
        .groupBy("l_returnflag", "total_w")
        .agg(F.min("l_extendedprice").alias("weighted_median_price"))
        .select(
            "l_returnflag",
            F.col("total_w").cast("long").alias("total_weight"),
            "weighted_median_price",
        )
    )
