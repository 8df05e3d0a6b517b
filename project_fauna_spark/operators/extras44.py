"""Round-6 batch 38: largest-remainder token apportionment and degree
assortativity.

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
# llm_token_budget_apportion — Hamilton's method for the data mixture
# --------------------------------------------------------------------------

_BUDGET_T = 1_000_000  # tokens to apportion across sources


@register(
    "llm_token_budget_apportion",
    oracle=f"""
    WITH c AS (
      SELECT source,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    n AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total FROM c),
    q AS (
      SELECT c.source, c.n_tokens,
             ({_BUDGET_T} * c.n_tokens) // n.total AS base_alloc,
             ({_BUDGET_T} * c.n_tokens) % n.total AS rem
      FROM c, n
    ),
    r AS (
      SELECT *,
             row_number() OVER (ORDER BY rem DESC, source) AS rk,
             {_BUDGET_T} - SUM(base_alloc) OVER () AS n_extra
      FROM q
    )
    SELECT source, n_tokens,
           CAST(base_alloc AS BIGINT) AS base_alloc,
           CAST(base_alloc + CASE WHEN rk <= n_extra THEN 1 ELSE 0 END
                AS BIGINT) AS final_alloc,
           rk <= n_extra AS got_extra
    FROM r
    """,
)
def llm_token_budget_apportion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of a 1M-token
    training budget across sources, proportional to each source's
    token mass: integer quotas ⌊T·c_i/N⌋ plus one extra token to the
    sources with the largest remainders until the budget is EXACTLY
    spent — the allocator behind every "sample X tokens per domain"
    plan (``llm_domain_mixture_weights`` produces the weights; this
    turns weights into integer budgets that sum to T with no float
    drift, the part naive rounding gets wrong).

    Pure integer arithmetic: quota floor and remainder come from one
    integer division (T·c_i ≤ 10¹³, no overflow), the remainder rank
    is totally ordered by (remainder DESC, source), and Σ final = T by
    construction.  Scale: one map-combined token aggregate, then a
    |sources|-sized frame — the windows run on dozens of rows.
    """
    c = (
        load_table(spark, sf_dir, "documents")
        .select("source", F.size(F.split("text", " ")).alias("toks"))
        .groupBy("source")
        .agg(F.sum("toks").alias("n_tokens"))
    )
    n = c.agg(F.sum("n_tokens").alias("total"))
    q = c.crossJoin(F.broadcast(n)).select(
        "source",
        "n_tokens",
        F.expr(f"({_BUDGET_T} * n_tokens) DIV total").alias("base_alloc"),
        ((F.lit(_BUDGET_T) * F.col("n_tokens")) % F.col("total")).alias("rem"),
    )
    r = q.select(
        "*",
        F.row_number().over(W.orderBy(F.col("rem").desc(), "source")).alias("rk"),
        (F.lit(_BUDGET_T) - F.sum("base_alloc").over(W.partitionBy())).alias(
            "n_extra"
        ),
    )
    extra = F.col("rk") <= F.col("n_extra")
    return r.select(
        "source",
        "n_tokens",
        F.col("base_alloc").cast("long").alias("base_alloc"),
        (F.col("base_alloc") + extra.cast("long")).cast("long").alias("final_alloc"),
        extra.alias("got_extra"),
    )


# --------------------------------------------------------------------------
# graph_degree_assortativity — do hubs trade with hubs?
# --------------------------------------------------------------------------


@register(
    "graph_degree_assortativity",
    oracle="""
    WITH de AS (
      SELECT c.c_nationkey AS a, s.s_nationkey AS b
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE c.c_nationkey <> s.s_nationkey
      GROUP BY 1, 2
    ),
    und AS (
      SELECT LEAST(a, b) AS u, GREATEST(a, b) AS v FROM de GROUP BY 1, 2
    ),
    deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS d
      FROM (SELECT u AS node FROM und UNION ALL SELECT v FROM und)
      GROUP BY node
    ),
    ends AS (
      SELECT du.d AS x, dv.d AS y FROM und
      JOIN deg du ON du.node = und.u
      JOIN deg dv ON dv.node = und.v
      UNION ALL
      SELECT dv.d, du.d FROM und
      JOIN deg du ON du.node = und.u
      JOIN deg dv ON dv.node = und.v
    ),
    m AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS np,
             SUM(CAST(x AS HUGEINT)) AS sx,
             SUM(CAST(y AS HUGEINT)) AS sy,
             SUM(CAST(x AS HUGEINT) * y) AS sxy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx,
             SUM(CAST(y AS HUGEINT) * y) AS syy
      FROM ends
    )
    SELECT CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_nodes,
           CAST((SELECT COUNT(*) FROM und) AS BIGINT) AS n_edges,
           CASE WHEN np * sxx - sx * sx > 0 AND np * syy - sy * sy > 0
                THEN CAST(CAST(np * sxy - sx * sy AS VARCHAR) AS DOUBLE)
                  / (sqrt(CAST(CAST(np * sxx - sx * sx AS VARCHAR) AS DOUBLE))
                     * sqrt(CAST(CAST(np * syy - sy * sy AS VARCHAR)
                                 AS DOUBLE)))
           END AS assortativity
    FROM m
    """,
)
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the undirected nation trade graph: the
    Pearson correlation of endpoint degrees over all edges (each edge
    counted in both orientations, the standard Newman definition) —
    positive when hubs trade with hubs, negative for the
    hub-and-spoke topology most trade networks show
    (``graph_degree_distribution`` gives the degree histogram; this is
    the one-number MIXING pattern of those degrees).

    Degrees are exact integers, so the correlation rides the shared
    exact-moment contract (decimal/HUGEINT sums, one division, two
    IEEE sqrts).  Scale: edges aggregate map-combined, degrees are
    one node-keyed aggregate, the endpoint join is edge-keyed — the
    moment accumulators merge map-side, so the whole statistic is one
    pass over the edge list.
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cu = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    su = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    de = (
        o.join(cu, o.o_custkey == cu.c_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(su, li.l_suppkey == su.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(F.col("c_nationkey").alias("a"), F.col("s_nationkey").alias("b"))
        .distinct()
    )
    und = cached(
        de.select(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        ).distinct()
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    ends_base = (
        und.join(deg.select(F.col("node").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("d").alias("dv")), "v")
        .select(F.col("du").alias("x"), F.col("dv").alias("y"))
    )
    # ONE explode instead of unionAll(ends_base, reversed ends_base):
    # the union spelling ran the two degree joins twice (r12; the CC
    # edge-build fix).  Same (x, y) multiset.
    ends = ends_base.select(
        F.explode(
            F.array(
                F.struct(F.col("x"), F.col("y")),
                F.struct(F.col("y").alias("x"), F.col("x").alias("y")),
            )
        ).alias("e")
    ).select("e.x", "e.y")
    from project_fauna_spark.functions.moments import (
        int_pearson_moments,
        pearson_terms,
    )

    m = int_pearson_moments(ends, [])
    _, dx, dy, corr = pearson_terms()
    counts = und.agg(
        F.count("*").alias("n_edges"),
    ).crossJoin(deg.agg(F.count("*").alias("n_nodes")))
    return counts.crossJoin(
        m.select(F.when((dx > 0) & (dy > 0), corr).alias("assortativity"))
    ).select("n_nodes", "n_edges", "assortativity")
