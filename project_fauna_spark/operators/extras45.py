"""Round-6 batch 39: price-volume-mix waterfall and effective category
counts.

Registered AFTER the round-6 grading window block (plans/__init__) —
new registrations must never perturb the first-50 window the driver
grades (pinned by tests/test_window_manifest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from project_fauna_spark.io import load_table
from project_fauna_spark.plans.registry import register, sql_dsum

# --------------------------------------------------------------------------
# q_price_volume_mix — WHY did revenue move?
# --------------------------------------------------------------------------

@register(
    "q_price_volume_mix",
    # Laspeyres-style bridge: ΔRev = ΔQ·P0 (volume effect) +
    # Q1·ΔP (price effect), with P = decimal-exact revenue / integer
    # quantity.  Revenues and quantities accumulate exactly; each P is
    # one division of VARCHAR-routed decimal edges; the effects are
    # products/differences of those identical doubles.
    oracle=f"""
    WITH yr AS (
      SELECT CAST(year(l_shipdate) AS BIGINT) AS y,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q,
             {sql_dsum('l_extendedprice * (1 - l_discount)', 30, 8)} AS rev
      FROM lineitem GROUP BY 1
    ),
    pair AS (
      SELECT y, q, rev,
             LAG(y) OVER (ORDER BY y) AS y0,
             LAG(q) OVER (ORDER BY y) AS q0,
             LAG(rev) OVER (ORDER BY y) AS rev0
      FROM yr
    )
    SELECT y0 AS year_from, y AS year_to,
           rev0 AS rev_from, rev AS rev_to,
           rev - rev0 AS delta_rev,
           (q - q0) * (rev0 / q0) AS volume_effect,
           q * (rev / q - rev0 / q0) AS price_effect
    FROM pair WHERE y0 IS NOT NULL
    """,
)
def q_price_volume_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price–volume bridge (the FP&A revenue waterfall): for every
    consecutive shipping-year pair, decompose the revenue change into
    a VOLUME effect (quantity change at last year's average unit
    price) and a PRICE effect (this year's quantity times the average
    unit-price change) — the two sum to ΔRev exactly by construction,
    which is the whole point of the Laspeyres bridge
    (``q_yearly_growth`` reports THAT revenue moved; this reports
    WHY).

    Quantities are exact BIGINTs and revenues exact decimals; each
    average price is one IEEE division of bit-equal edges, and the
    effects are products of those identical doubles — deterministic
    with no decimal re-routing because nothing float ever
    RE-accumulates.  Scale: one map-combined year aggregate; the lag
    and arithmetic run on the years-sized frame.
    """
    yr = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.year("l_shipdate").cast("long").alias("y"))
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("q"),
            F.sum(
                (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast(
                    "decimal(30,8)"
                )
            )
            .cast("double")
            .alias("rev"),
        )
    )
    ow = W.orderBy("y")
    pair = yr.select(
        "y",
        "q",
        "rev",
        F.lag("y").over(ow).alias("y0"),
        F.lag("q").over(ow).alias("q0"),
        F.lag("rev").over(ow).alias("rev0"),
    ).filter(F.col("y0").isNotNull())
    p0 = F.col("rev0") / F.col("q0")
    p1 = F.col("rev") / F.col("q")
    return pair.select(
        F.col("y0").alias("year_from"),
        F.col("y").alias("year_to"),
        F.col("rev0").alias("rev_from"),
        F.col("rev").alias("rev_to"),
        (F.col("rev") - F.col("rev0")).alias("delta_rev"),
        ((F.col("q") - F.col("q0")) * p0).alias("volume_effect"),
        (F.col("q") * (p1 - p0)).alias("price_effect"),
    )


# --------------------------------------------------------------------------
# dq_effective_categories — how many categories REALLY carry the data?
# --------------------------------------------------------------------------


def _enc_sql(table: str, col: str) -> str:
    return f"""
    SELECT '{table}.{col}' AS column_name,
           CAST(SUM(c) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(SUM(c) * SUM(c) AS DOUBLE)
             / CAST(SUM(CAST(c AS HUGEINT) * c) AS DOUBLE) AS effective_n,
           CAST(SUM(c) * SUM(c) AS DOUBLE)
             / CAST(SUM(CAST(c AS HUGEINT) * c) AS DOUBLE) / COUNT(*)
             AS balance_ratio
    FROM (SELECT {col} AS v, CAST(COUNT(*) AS BIGINT) AS c
          FROM {table} GROUP BY 1)
    """


@register(
    "dq_effective_categories",
    oracle=" UNION ALL ".join(
        [
            _enc_sql("events", "event_type"),
            _enc_sql("documents", "lang"),
            _enc_sql("documents", "source"),
            _enc_sql("customer", "c_mktsegment"),
        ]
    ),
)
def dq_effective_categories(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective number of categories (inverse Simpson / Hill number
    of order 2) for the main categorical columns: N²/Σc² — equals the
    distinct count when mass is perfectly balanced and collapses
    toward 1 when one category dominates; ``balance_ratio`` =
    effective/distinct is the 0–1 imbalance dial.  The log-free
    diversity index (Shannon needs ln) that tells a pipeline whether
    "20 sources" is really 20 sources or 2 sources wearing 18 hats —
    the input to stratification and mixture decisions.

    All-integer numerators (Σc² in decimal/HUGEINT), TWO divisions at
    the edge per column, computed identically in both engines.  Each
    column is one map-combined count aggregate; the union output is
    4 rows.
    """

    def enc(table: str, col: str) -> DataFrame:
        c = (
            load_table(spark, sf_dir, table)
            .groupBy(F.col(col).alias("v"))
            .agg(F.count("*").alias("c"))
        )
        # decimal product: long*long would ANSI-overflow past ~3e9 rows
        eff = (
            F.col("n_rows").cast("decimal(38,0)") * F.col("n_rows")
        ).cast("double") / F.col("sum_c2").cast("double")
        return (
            c.agg(
                F.sum("c").alias("n_rows"),
                F.count("*").alias("n_distinct"),
                F.sum((F.col("c").cast("decimal(38,0)") * F.col("c"))).alias(
                    "sum_c2"
                ),
            )
            .select(
                F.lit(f"{table}.{col}").alias("column_name"),
                "n_rows",
                "n_distinct",
                eff.alias("effective_n"),
                (eff / F.col("n_distinct")).alias("balance_ratio"),
            )
        )

    return (
        enc("events", "event_type")
        .unionAll(enc("documents", "lang"))
        .unionAll(enc("documents", "source"))
        .unionAll(enc("customer", "c_mktsegment"))
    )
