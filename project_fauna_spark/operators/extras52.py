"""Round-6 batch 46: growth-contribution bridge and top-customer
leaderboard churn.

Registered AFTER the round-6 grading window block (plans/__init__) —
new registrations must never perturb the first-50 window the driver
grades (pinned by tests/test_window_manifest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from project_fauna_spark.cache import cached
from project_fauna_spark.io import load_table
from project_fauna_spark.plans.registry import register, sql_dsum

# --------------------------------------------------------------------------
# q_growth_contribution_by_segment — WHO moved the number?
# --------------------------------------------------------------------------


@register(
    "q_growth_contribution_by_segment",
    oracle=f"""
    WITH yr AS (
      SELECT c.c_mktsegment AS seg,
             CAST(year(o.o_orderdate) AS BIGINT) AS y,
             {sql_dsum('o.o_totalprice', 30, 8)} AS rev
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ),
    pair AS (
      SELECT seg, y, rev,
             LAG(rev) OVER (PARTITION BY seg ORDER BY y) AS rev0,
             LAG(y) OVER (PARTITION BY seg ORDER BY y) AS y0
      FROM yr
    ),
    d AS (
      SELECT seg, y0 AS year_from, y AS year_to, rev - rev0 AS delta_rev
      FROM pair WHERE y0 = y - 1
    ),
    tot AS (
      SELECT year_from, year_to,
             CAST(CAST(SUM(CAST(CAST(delta_rev AS VARCHAR)
                                AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE)
               AS total_delta
      FROM d GROUP BY 1, 2
    )
    SELECT d.seg AS c_mktsegment, d.year_from, d.year_to, d.delta_rev,
           CASE WHEN t.total_delta <> 0
                THEN d.delta_rev / t.total_delta END AS contribution_share
    FROM d JOIN tot t USING (year_from, year_to)
    """,
)
def q_growth_contribution_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth-contribution bridge: each market segment's share of the
    total year-over-year revenue change — the "WHO moved the number"
    decomposition that pairs with ``q_price_volume_mix``'s "WHY"
    (price vs volume); segment deltas sum to the total delta by
    construction, so the waterfall always closes.

    Revenue accumulates in exact decimal per (segment, year); each
    delta is a subtraction of bit-equal doubles, the total delta
    re-enters decimal (a cross-row float sum), and each share is ONE
    division — NULL when the total change is exactly zero rather than
    divided by.  Consecutive years only (y0 = y−1), so a segment dark
    for a year contributes nothing instead of bridging a gap.  Scale:
    one broadcast-dim join + (segment, year) aggregate; everything
    after is segments×years-sized.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    yr = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.year("o_orderdate").cast("long").alias("y"),
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(30,8)")).cast("double").alias("rev"))
    )
    bys = W.partitionBy("seg").orderBy("y")
    d = (
        yr.select(
            "seg",
            "y",
            "rev",
            F.lag("rev").over(bys).alias("rev0"),
            F.lag("y").over(bys).alias("y0"),
        )
        .filter(F.col("y0") == F.col("y") - 1)
        .select(
            "seg",
            F.col("y0").alias("year_from"),
            F.col("y").alias("year_to"),
            (F.col("rev") - F.col("rev0")).alias("delta_rev"),
        )
    )
    d = cached(d)
    tot = d.groupBy("year_from", "year_to").agg(
        F.sum(F.col("delta_rev").cast("decimal(30,8)"))
        .cast("double")
        .alias("total_delta")
    )
    return d.join(F.broadcast(tot), ["year_from", "year_to"]).select(
        F.col("seg").alias("c_mktsegment"),
        "year_from",
        "year_to",
        "delta_rev",
        F.when(
            F.col("total_delta") != 0,
            F.col("delta_rev") / F.col("total_delta"),
        ).alias("contribution_share"),
    )


# --------------------------------------------------------------------------
# q_top_customer_churn — is the leaderboard stable?
# --------------------------------------------------------------------------

_TOP_N = 10


@register(
    "q_top_customer_churn",
    oracle=f"""
    WITH cy AS (
      SELECT o_custkey, CAST(year(o_orderdate) AS BIGINT) AS y,
             {sql_dsum('o_totalprice', 30, 8)} AS rev
      FROM orders GROUP BY 1, 2
    ),
    top AS (
      SELECT y, o_custkey
      FROM (SELECT y, o_custkey,
                   row_number() OVER (PARTITION BY y
                                      ORDER BY rev DESC, o_custkey) AS rk
            FROM cy)
      WHERE rk <= {_TOP_N}
    ),
    years AS (SELECT DISTINCT y FROM top),
    pairs AS (
      SELECT y AS year_from, LEAD(y) OVER (ORDER BY y) AS year_to
      FROM years
    )
    SELECT p.year_from, p.year_to,
           CAST(COUNT(b.o_custkey) AS BIGINT) AS n_retained,
           CAST({_TOP_N} - COUNT(b.o_custkey) AS BIGINT) AS n_new,
           CAST(COUNT(b.o_custkey) AS DOUBLE) / {_TOP_N} AS retention
    FROM pairs p
    JOIN top a ON a.y = p.year_from
    LEFT JOIN top b ON b.y = p.year_to AND b.o_custkey = a.o_custkey
    WHERE p.year_to IS NOT NULL
    GROUP BY 1, 2
    """,
)
def q_top_customer_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leaderboard stability: of each year's top-10 customers by
    revenue, how many are STILL top-10 the next year — the
    key-account churn metric that tells sales whether the big-spender
    set is a stable book of business or a revolving door
    (``q_value_band_migration`` tracks band flows for everyone; this
    watches the head of the distribution, where revenue actually
    concentrates per ``agg_lorenz_deciles``).

    Top-10 per year is a rank over the (customer, year) aggregate —
    a years-partitioned window on an already-reduced frame — with a
    total (revenue, custkey) tie-break on bit-equal decimal-exact
    revenues; retention is ONE division by the constant 10.  Scale:
    one map-combined aggregate; the rank and the year-pair join touch
    only years×customers and years×10 rows.
    """
    cy = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            "o_custkey", F.year("o_orderdate").cast("long").alias("y")
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(30,8)"))
            .cast("double")
            .alias("rev")
        )
    )
    rk = F.row_number().over(
        W.partitionBy("y").orderBy(F.col("rev").desc(), "o_custkey")
    )
    top = cached(
        cy.select("y", "o_custkey", rk.alias("rk")).filter(F.col("rk") <= _TOP_N)
    )
    years = top.select("y").distinct()
    pairs = years.select(
        F.col("y").alias("year_from"),
        F.lead("y").over(W.orderBy("y")).alias("year_to"),
    ).filter(F.col("year_to").isNotNull())
    a = top.select(F.col("y").alias("year_from"), F.col("o_custkey").alias("ck"))
    b = top.select(F.col("y").alias("yt2"), F.col("o_custkey").alias("ck2"))
    return (
        pairs.join(a, "year_from")
        .join(
            b,
            (F.col("year_to") == F.col("yt2")) & (F.col("ck") == F.col("ck2")),
            "left",
        )
        .groupBy("year_from", "year_to")
        .agg(F.count("ck2").alias("n_retained"))
        .select(
            "year_from",
            "year_to",
            F.col("n_retained").cast("long").alias("n_retained"),
            (F.lit(_TOP_N) - F.col("n_retained")).cast("long").alias("n_new"),
            (F.col("n_retained").cast("double") / F.lit(_TOP_N)).alias(
                "retention"
            ),
        )
    )
