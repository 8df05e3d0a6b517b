"""Round-6 batch 17: nation trade balance and a weekday×hour traffic
heatmap.

Registered AFTER the round-6 grading window block (plans/__init__) —
new registrations must never perturb the first-50 window the driver
grades (pinned by tests/test_window_manifest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from project_fauna_spark.cache import cached
from project_fauna_spark.io import load_table
from project_fauna_spark.plans.registry import register, sql_dsum, dsum

# --------------------------------------------------------------------------
# q_nation_trade_balance — who sells more than they buy?
# --------------------------------------------------------------------------


@register(
    "q_nation_trade_balance",
    oracle=f"""
    WITH exp AS (
      SELECT s.s_nationkey AS nk,
             {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS exports
      FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY 1
    ),
    imp AS (
      SELECT c.c_nationkey AS nk,
             {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS imports
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1
    )
    SELECT n.n_name,
           COALESCE(e.exports, 0.0) AS exports,
           COALESCE(i.imports, 0.0) AS imports,
           COALESCE(e.exports, 0.0) - COALESCE(i.imports, 0.0)
             AS trade_balance
    FROM nation n
    LEFT JOIN exp e ON e.nk = n.n_nationkey
    LEFT JOIN imp i ON i.nk = n.n_nationkey
    """,
)
def q_nation_trade_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trade balance per nation: discounted line-item revenue earned
    by the nation's SUPPLIERS (exports) versus spent by its CUSTOMERS
    (imports), and the net — the two sides of the trade graph that
    ``graph_pagerank_trade`` ranks, reduced to the economics headline
    (TPC-H Q5 asks one region's slice; this is the full square-up).

    Both sides are decimal-accumulated revenue sums (``dsum``) keyed
    on the 25-value nation key, aggregated INDEPENDENTLY and then
    broadcast-joined onto the nation dimension — the lineitem scan
    runs once per side with its own natural join path (supplier
    broadcast on one; the orderkey-colocatable orders join + customer
    broadcast on the other).  Nations with no activity report exact
    0.0 rather than dropping out.  The balance is one subtraction of
    the two decimal-rounded doubles at the edge.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias(
            "rev"
        ),
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    exp = (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(dsum(F.col("rev")).alias("exports"))
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    imp = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cust, o.o_custkey == cust.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(dsum(F.col("rev")).alias("imports"))
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    exports = F.coalesce(F.col("exports"), F.lit(0.0))
    imports = F.coalesce(F.col("imports"), F.lit(0.0))
    return (
        n.join(F.broadcast(exp), n.n_nationkey == exp.nk, "left")
        .join(F.broadcast(imp), n.n_nationkey == imp.nk, "left")
        .select(
            "n_name",
            exports.alias("exports"),
            imports.alias("imports"),
            (exports - imports).alias("trade_balance"),
        )
    )


# --------------------------------------------------------------------------
# ts_dow_hour_heatmap — the weekly traffic fingerprint
# --------------------------------------------------------------------------


@register(
    "ts_dow_hour_heatmap",
    oracle="""
    WITH c AS (
      SELECT isodow(CAST(ts AS DATE)) AS iso_dow,
             hour(ts) AS hour_of_day,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(SUM(n_events) AS BIGINT) AS te FROM c)
    SELECT CAST(iso_dow AS BIGINT) AS iso_dow,
           CAST(hour_of_day AS BIGINT) AS hour_of_day,
           n_events,
           CAST(n_events AS DOUBLE) / tot.te AS share
    FROM c CROSS JOIN tot
    """,
)
def ts_dow_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The weekly traffic fingerprint: event counts and shares on the
    (ISO weekday × hour-of-day) grid — the ≤168-cell heatmap behind
    capacity planning, maintenance-window choice, and the finer-grained
    twin of ``ts_weekday_profile`` (which collapses the hour axis).

    One map-combined aggregate on a bounded composite key; shares are
    single integer divisions against a broadcast 1-row total.  The
    weekday/hour keys are engine-identical (Spark ``weekday()+1`` ≡
    DuckDB ``isodow``; both ``hour()`` read the same session-UTC
    timestamps — the ``io.load_table`` normalization contract).
    """
    e = load_table(spark, sf_dir, "events").select(
        (F.expr("weekday(to_date(ts))") + F.lit(1)).cast("long").alias(
            "iso_dow"
        ),
        F.hour("ts").cast("long").alias("hour_of_day"),
    )
    # c feeds the total aggregate AND the final select — persist the
    # ≤168-row grid so the events scan runs once.
    c = cached(
        e.groupBy("iso_dow", "hour_of_day").agg(
            F.count("*").alias("n_events")
        )
    )
    tot = c.agg(F.sum("n_events").alias("te"))
    return c.crossJoin(F.broadcast(tot)).select(
        "iso_dow",
        "hour_of_day",
        F.col("n_events").cast("long").alias("n_events"),
        (F.col("n_events").cast("double") / F.col("te")).alias("share"),
    )
