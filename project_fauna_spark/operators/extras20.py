"""Round-6 batch 14: centroid silhouette (cluster-quality eval), a
Lorenz concentration curve, and supplier lead-time reporting.

Registered AFTER the round-6 grading window block (plans/__init__) —
new registrations must never perturb the first-50 window the driver
grades (pinned by tests/test_window_manifest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from project_fauna_spark.functions.centroids import (
    label_centroids,
    sql_centroid_ctes,
)
from project_fauna_spark.functions.ranks import bucket_offsets_multi
from project_fauna_spark.functions.vectors import euclidean_dist
from project_fauna_spark.io import load_table
from project_fauna_spark.plans.registry import register, davg, sql_davg

# --------------------------------------------------------------------------
# sim_silhouette_centroid — is the labeling actually a clustering?
# --------------------------------------------------------------------------

_FOLD_K = 256  # the sim_label_centroid two-level fold width

_SQL_SQDIST = (
    "sqrt(list_reduce(list_transform(range(1, len({a})+1),"
    " k -> ({a}[k] - {b}[k]) * ({a}[k] - {b}[k])), (x, y) -> x + y))"
)


@register(
    "sim_silhouette_centroid",
    oracle=f"""
    WITH {sql_centroid_ctes(_FOLD_K)},
    d AS (
      SELECT e.vec_id, e.label, c.label AS clabel,
             {_SQL_SQDIST.format(a='e.emb', b='c.centroid')} AS dist
      FROM e CROSS JOIN cent c
    ),
    pv AS (
      SELECT vec_id, label,
             MAX(CASE WHEN clabel = label THEN dist END) AS a,
             MIN(CASE WHEN clabel <> label THEN dist END) AS b
      FROM d GROUP BY vec_id, label
    ),
    sv AS (
      SELECT label,
             CASE WHEN greatest(a, b) = 0 THEN 0.0
                  ELSE (b - a) / greatest(a, b) END AS s
      FROM pv
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           {sql_davg('sv.s')} AS mean_silhouette,
           CAST(COUNT(CASE WHEN s < 0 THEN 1 END) AS BIGINT) AS n_negative
    FROM sv GROUP BY label
    """,
)
def sim_silhouette_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centroid-based silhouette per label: for every vector,
    a = distance to its OWN label centroid, b = distance to the
    NEAREST OTHER centroid, s = (b−a)/max(a,b) ∈ [−1, 1]; the report
    gives each label's mean silhouette and how many of its members sit
    closer to a foreign centroid (s < 0 — the misclustered ones).
    This is the cluster-quality verdict on the label structure the
    ``sim_*`` retrieval operators assume (the full-pairwise silhouette
    is O(n²); the centroid variant is the standard large-scale proxy).

    Centroids use the ``sim_label_centroid`` two-level fixed-order
    fold (≤{_FOLD_K} vectors per level-1 bucket — bounded state,
    deterministic order, bit-identical to the oracle's matching fold);
    distances are index-ordered folds closed by an IEEE-exact sqrt, so
    every per-vector s is bit-equal across engines and the means are
    decimal-accumulated (``davg``).  Scale: the distance pass is a
    broadcast of the tiny centroid table against one linear scan;
    per-vector reduction and the label rollup are map-combined.
    """
    e = load_table(spark, sf_dir, "embeddings")
    demb = F.transform("embedding", lambda x: x.cast("double"))
    cent = label_centroids(e, _FOLD_K).select(
        F.col("label").alias("clabel"), "centroid"
    )
    d = e.select("vec_id", "label", demb.alias("emb")).crossJoin(
        F.broadcast(cent)
    ).select(
        "vec_id",
        "label",
        "clabel",
        euclidean_dist(F.col("emb"), F.col("centroid")).alias("dist"),
    )
    pv = d.groupBy("vec_id", "label").agg(
        F.max(
            F.when(F.col("clabel") == F.col("label"), F.col("dist"))
        ).alias("a"),
        F.min(
            F.when(F.col("clabel") != F.col("label"), F.col("dist"))
        ).alias("b"),
    )
    s = F.when(F.greatest("a", "b") == 0, F.lit(0.0)).otherwise(
        (F.col("b") - F.col("a")) / F.greatest("a", "b")
    )
    return (
        pv.select("label", s.alias("s"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            davg(F.col("s")).alias("mean_silhouette"),
            F.count(F.when(F.col("s") < 0, 1)).alias("n_negative"),
        )
        .select(
            "label",
            F.col("n_vecs").cast("long").alias("n_vecs"),
            "mean_silhouette",
            F.col("n_negative").cast("long").alias("n_negative"),
        )
    )


# --------------------------------------------------------------------------
# agg_lorenz_deciles — customer revenue concentration curve
# --------------------------------------------------------------------------

_LORENZ_BUCKET = 65536  # spend-range bucket width for the two-phase rank


@register(
    "agg_lorenz_deciles",
    oracle="""
    WITH sp AS (
      SELECT o_custkey,
             SUM(CAST(CAST(o_totalprice AS VARCHAR) AS DECIMAL(30,8)))
               AS spend
      FROM orders GROUP BY o_custkey
    ),
    r AS (
      SELECT spend,
             ROW_NUMBER() OVER (ORDER BY spend, o_custkey) AS rnk,
             SUM(spend) OVER (ORDER BY spend, o_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             COUNT(*) OVER () AS n,
             SUM(spend) OVER () AS tot
      FROM sp
    ),
    d AS (
      SELECT (10 * rnk + n - 1) // n AS decile, spend, cum, tot FROM r
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(CAST(SUM(spend) AS VARCHAR) AS DOUBLE) AS decile_value,
           CAST(CAST(SUM(spend) AS VARCHAR) AS DOUBLE)
             / CAST(CAST(MAX(tot) AS VARCHAR) AS DOUBLE) AS decile_share,
           CAST(CAST(MAX(cum) AS VARCHAR) AS DOUBLE)
             / CAST(CAST(MAX(tot) AS VARCHAR) AS DOUBLE) AS cum_share
    FROM d GROUP BY decile
    """,
)
def agg_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve of customer revenue concentration: customers
    sorted by total spend, cut into exact-rank deciles (decile d =
    ranks in (((d−1)·n)/10, (d·n)/10], i.e. ``⌈10·rank/n⌉``), with
    each decile's revenue share and the cumulative share through it —
    the curve whose area deficit IS the Gini that
    ``agg_gini_concentration`` reports as a scalar, and the
    decile-table form of ``q_abc_pareto_classification``'s A/B/C cut.

    Per-customer spend accumulates in decimal(30,8) (VARCHAR-routed
    into DuckDB), so ranks and cumulative sums compare EXACT decimals,
    never doubles.  Both the global rank and the global running spend
    come from the repo's two-phase decomposition in ONE
    ``bucket_offsets_multi`` pass (row counts + spend per
    floor(spend)-range bucket; bucket-local windows carry their bucket
    key), and the decile assignment is pure integer arithmetic.  The
    only doubles are the share divisions at the compared edge.  Scale:
    one custkey aggregate, one bucket-keyed shuffle, a broadcast
    offsets table, and a 10-row rollup.
    """
    sp = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(30,8)")).alias("spend")
        )
        .withColumn(
            "bkt",
            F.expr(f"cast(floor(spend) as bigint) div {_LORENZ_BUCKET}"),
        )
    )
    offs = bucket_offsets_multi(
        sp,
        [],
        "bkt",
        [(F.lit(1), "off_n", "n_total"), (F.col("spend"), "off_s", "s_total")],
    )
    w_rn = W.partitionBy("bkt").orderBy("spend", "o_custkey")
    w_cum = w_rn.rowsBetween(W.unboundedPreceding, 0)
    ranked = sp.join(F.broadcast(offs), "bkt").select(
        "spend",
        (F.col("off_n") + F.row_number().over(w_rn)).cast("long").alias("rnk"),
        (F.col("off_s") + F.sum("spend").over(w_cum)).alias("cum"),
        F.col("n_total").cast("long").alias("n"),
        F.col("s_total").alias("tot"),
    )
    decile = F.expr("(10 * rnk + n - 1) div n")
    by_dec = ranked.groupBy(decile.cast("long").alias("decile")).agg(
        F.count("*").alias("n_customers"),
        F.sum("spend").alias("dspend"),
        F.max("cum").alias("dcum"),
        F.max("tot").alias("dtot"),
    )
    dv = F.col("dspend").cast("double")
    tt = F.col("dtot").cast("double")
    return by_dec.select(
        "decile",
        F.col("n_customers").cast("long").alias("n_customers"),
        dv.alias("decile_value"),
        (dv / tt).alias("decile_share"),
        (F.col("dcum").cast("double") / tt).alias("cum_share"),
    )


# --------------------------------------------------------------------------
# q_supplier_lead_time — order→ship latency per supplier nation
# --------------------------------------------------------------------------


@register(
    "q_supplier_lead_time",
    oracle=f"""
    SELECT n.n_name,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           {sql_davg("date_diff('day', CAST(o.o_orderdate AS DATE),"
                     " CAST(l.l_shipdate AS DATE))")} AS avg_lead_days,
           CAST(MIN(date_diff('day', CAST(o.o_orderdate AS DATE),
                              CAST(l.l_shipdate AS DATE))) AS BIGINT)
             AS min_lead_days,
           CAST(MAX(date_diff('day', CAST(o.o_orderdate AS DATE),
                              CAST(l.l_shipdate AS DATE))) AS BIGINT)
             AS max_lead_days
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY 1
    """,
)
def q_supplier_lead_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fulfillment lead time per supplier nation: days from order
    placement to line-item ship date, with per-nation line counts and
    mean/min/max latency — the supplier-SLA scorecard that pairs with
    ``q_orders_backlog_aging`` (what's stuck) by saying who ships slow
    once things do move.

    Lead times are exact integer day diffs; the mean is
    decimal-accumulated (``davg``).  The only data-sized shuffle is
    the lineitem⋈orders equi join on l_orderkey — the natural
    co-location key for both tables (bucketed layouts make it
    shuffle-free; AQE handles the residual skew) — while supplier and
    nation broadcast; the nation rollup is map-combined into ≤25
    groups.
    """
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", F.to_date("l_shipdate").alias("sd")
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("od")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    lead = F.datediff(F.col("sd"), F.col("od"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(s, l.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_lines"),
            davg(lead).alias("avg_lead_days"),
            F.min(lead).cast("long").alias("min_lead_days"),
            F.max(lead).cast("long").alias("max_lead_days"),
        )
        .select(
            "n_name",
            F.col("n_lines").cast("long").alias("n_lines"),
            "avg_lead_days",
            "min_lead_days",
            "max_lead_days",
        )
    )
