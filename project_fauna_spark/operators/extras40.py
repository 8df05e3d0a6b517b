"""Round-6 batch 34: Theil–Sen robust trend and unit-price dispersion.

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
# ts_theil_sen_trend — the robust slope a single outlier day can't bend
# --------------------------------------------------------------------------


@register(
    "ts_theil_sen_trend",
    oracle="""
    WITH daily AS (
      SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    p AS (
      SELECT a.x AS xa, a.y AS ya, b.x AS xb, b.y AS yb
      FROM daily a JOIN daily b ON a.x < b.x
    ),
    s AS (
      SELECT CAST(yb - ya AS DOUBLE) / CAST(xb - xa AS DOUBLE) AS slope,
             xa, xb
      FROM p
    ),
    r AS (
      SELECT slope,
             row_number() OVER (ORDER BY slope, xa, xb) AS rn,
             COUNT(*) OVER () AS m
      FROM s
    ),
    med AS (
      SELECT CAST(MAX(m) AS BIGINT) AS n_pairs,
             AVG(slope) FILTER (WHERE rn * 2 IN (m, m + 1, m + 2))
               AS theil_sen_slope
      FROM r
    ),
    mm AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS np,
             SUM(CAST(x AS HUGEINT)) AS sx,
             SUM(CAST(y AS HUGEINT)) AS sy,
             SUM(CAST(x AS HUGEINT) * y) AS sxy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx
      FROM daily
    )
    SELECT CAST(mm.np AS BIGINT) AS n_days, med.n_pairs,
           med.theil_sen_slope,
           CAST(CAST(mm.np * mm.sxy - mm.sx * mm.sy AS VARCHAR) AS DOUBLE)
             / CAST(CAST(mm.np * mm.sxx - mm.sx * mm.sx AS VARCHAR) AS DOUBLE)
             AS ols_slope
    FROM med, mm
    """,
)
def ts_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen estimator of the daily-volume trend — the MEDIAN of
    all pairwise day-to-day slopes — next to the OLS slope it
    robustifies: one outlier day (a backfill dump, an outage) can drag
    OLS arbitrarily but moves Theil–Sen by at most one rank.  The
    spread between the two columns IS the outlier alarm.

    Exactness: each pairwise slope is one IEEE division of exact
    integer differences (identical both engines); the median is
    rank-selected under a total (slope, xa, xb) order — for an even
    pair count the two middle slopes average, a single
    order-independent (a+b)/2.  The OLS twin uses the shared integer
    moments.  Scale: the pairwise frame is days²-sized — CALENDAR²,
    not data² (90 days → 4 005 pairs) — built after the one
    map-combined daily aggregate; a multi-year series would bound
    pairs with the standard windowed-Theil–Sen variant.
    """
    daily = cached(
        load_table(spark, sf_dir, "events")
        .select(
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias(
                "x"
            )
        )
        .groupBy("x")
        .agg(F.count("*").alias("y"))
    )
    a = daily.select(F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = daily.select(F.col("x").alias("xb"), F.col("y").alias("yb"))
    s = (
        a.join(b, F.col("xa") < F.col("xb"))
        .select(
            (
                (F.col("yb") - F.col("ya")).cast("double")
                / (F.col("xb") - F.col("xa")).cast("double")
            ).alias("slope"),
            "xa",
            "xb",
        )
    )
    r = s.select(
        "slope",
        F.row_number().over(W.orderBy("slope", "xa", "xb")).alias("rn"),
        F.count("*").over(W.partitionBy()).alias("m"),
    )
    med = r.agg(
        F.max("m").cast("long").alias("n_pairs"),
        F.avg(
            F.when(
                (F.col("rn") * 2 == F.col("m"))
                | (F.col("rn") * 2 == F.col("m") + 1)
                | (F.col("rn") * 2 == F.col("m") + 2),
                F.col("slope"),
            )
        ).alias("theil_sen_slope"),
    )
    mm = int_pearson_moments(daily, [])
    num, dx, _, _ = pearson_terms()
    ols = mm.select(
        F.col("np_l").cast("long").alias("n_days"),
        (num.cast("double") / dx.cast("double")).alias("ols_slope"),
    )
    return med.crossJoin(ols).select(
        "n_days", "n_pairs", "theil_sen_slope", "ols_slope"
    )


# --------------------------------------------------------------------------
# q_unit_price_dispersion — law-of-one-price violations
# --------------------------------------------------------------------------

_DISP_MIN_LINES = 5
_DISP_TOP = 20


@register(
    "q_unit_price_dispersion",
    oracle=f"""
    WITH u AS (
      SELECT l_partkey, l_extendedprice / l_quantity AS up FROM lineitem
    ),
    g AS (
      SELECT l_partkey,
             CAST(COUNT(*) AS BIGINT) AS n_lines,
             MIN(up) AS min_unit_price,
             MAX(up) AS max_unit_price
      FROM u GROUP BY 1
      HAVING COUNT(*) >= {_DISP_MIN_LINES}
    )
    SELECT l_partkey, n_lines, min_unit_price, max_unit_price,
           max_unit_price / min_unit_price AS dispersion_ratio
    FROM g
    ORDER BY dispersion_ratio DESC, l_partkey
    LIMIT {_DISP_TOP}
    """,
)
def q_unit_price_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Law-of-one-price audit: the 20 parts whose realized UNIT price
    (extended price / quantity) varies most across order lines —
    max/min ratio per part, minimum 5 lines — the procurement
    arbitrage / pricing-error shortlist (``agg_supplier_hhi`` scores
    supplier concentration; this scores PRICE inconsistency for the
    same good).

    The unit price is one per-row IEEE division of identical stored
    doubles; min/max compare those bit-equal values and the dispersion
    ratio is one more division — no accumulation anywhere, so no
    decimal routing is needed.  Scale: one map-combined partkey
    aggregate, then TakeOrdered 20 with a total (ratio, partkey)
    tie-break — never a global sort.
    """
    u = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("up"),
    )
    g = (
        u.groupBy("l_partkey")
        .agg(
            F.count("*").alias("n_lines"),
            F.min("up").alias("min_unit_price"),
            F.max("up").alias("max_unit_price"),
        )
        .filter(F.col("n_lines") >= _DISP_MIN_LINES)
    )
    return (
        g.select(
            "l_partkey",
            "n_lines",
            "min_unit_price",
            "max_unit_price",
            (F.col("max_unit_price") / F.col("min_unit_price")).alias(
                "dispersion_ratio"
            ),
        )
        .orderBy(F.col("dispersion_ratio").desc(), "l_partkey")
        .limit(_DISP_TOP)
    )
