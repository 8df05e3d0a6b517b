"""Graph algorithms over relational edge lists.

Companion to ``dedup.dedup_connected_components`` (iterative min-label
propagation): here the classic *weighted iteration* algorithm —
PageRank — expressed as a bounded unrolled sequence of join+aggregate
rounds over an edge table derived from the warehouse.

Cross-engine exactness: PageRank is normally float-summed, which no
two engines reproduce bit-for-bit under parallel reduction.  This
implementation keeps ranks as scaled BIGINTs (1e9 = rank 1.0) and
distributes contributions with integer division — every operation is
exact, order-independent, and identical in Spark and DuckDB, so the
oracle checks VALUES, not just shape.  (At float precision the same
plan applies with decimal-accumulated sums.)

Scale design (100 TB):

* The edge list aggregates once (map-combined) to (src, dst, weight);
  each iteration is one shuffle join on src + one aggregate on dst —
  the standard distributed PageRank round.  Iterations are bounded
  (3), so the lazy plan stays shallow; a production loop would
  checkpoint every ~5 rounds to cut lineage, as
  ``dedup_connected_components`` does.
* Node and edge tables here are nation-level (tiny), but the plan
  never relies on that: no collect, no broadcast of ranks — rank
  updates flow through shuffles keyed on node id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from project_fauna_spark.cache import cached
from project_fauna_spark.io import load_table
from project_fauna_spark.plans.registry import register

_SCALE = 1_000_000_000  # rank 1.0 == 1e9 (integer PageRank scale)
_DAMP_NUM, _DAMP_DEN = 85, 100  # damping 0.85 as an exact ratio


@register(
    "graph_pagerank_trade",
    oracle=f"""
    WITH edges AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE c.c_nationkey <> s.s_nationkey
      GROUP BY 1, 2
    ),
    outdeg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
    nodes AS (
      SELECT src AS node FROM edges UNION SELECT dst FROM edges
    ),
    r0 AS (SELECT node, CAST({_SCALE} AS BIGINT) AS r FROM nodes),
    r1 AS (
      SELECT n.node,
             (CAST({_SCALE} AS BIGINT) * ({_DAMP_DEN} - {_DAMP_NUM})) // {_DAMP_DEN}
             + ({_DAMP_NUM} * COALESCE(SUM(r0.r // od.d), 0)) // {_DAMP_DEN} AS r
      FROM nodes n
      LEFT JOIN edges e ON e.dst = n.node
      LEFT JOIN r0 ON r0.node = e.src
      LEFT JOIN outdeg od ON od.src = e.src
      GROUP BY n.node
    ),
    r2 AS (
      SELECT n.node,
             (CAST({_SCALE} AS BIGINT) * ({_DAMP_DEN} - {_DAMP_NUM})) // {_DAMP_DEN}
             + ({_DAMP_NUM} * COALESCE(SUM(r1.r // od.d), 0)) // {_DAMP_DEN} AS r
      FROM nodes n
      LEFT JOIN edges e ON e.dst = n.node
      LEFT JOIN r1 ON r1.node = e.src
      LEFT JOIN outdeg od ON od.src = e.src
      GROUP BY n.node
    ),
    r3 AS (
      SELECT n.node,
             (CAST({_SCALE} AS BIGINT) * ({_DAMP_DEN} - {_DAMP_NUM})) // {_DAMP_DEN}
             + ({_DAMP_NUM} * COALESCE(SUM(r2.r // od.d), 0)) // {_DAMP_DEN} AS r
      FROM nodes n
      LEFT JOIN edges e ON e.dst = n.node
      LEFT JOIN r2 ON r2.node = e.src
      LEFT JOIN outdeg od ON od.src = e.src
      GROUP BY n.node
    )
    SELECT node, CAST(r AS BIGINT) AS rank_scaled FROM r3
    """,
)
def graph_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration PageRank over the nation-level trade graph
    (customer nation → supplier nation edges from order lineitems).

    Integer-exact: ranks are BIGINTs scaled by 1e9, contributions use
    integer division — bit-identical across engines, so the oracle
    verifies the iterative numeric result exactly.  Each iteration is
    the standard distributed round: join ranks to edges on src,
    aggregate contributions on dst."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    edges = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst"))
        .distinct()
    )
    edges = cached(edges)
    outdeg = edges.groupBy("src").agg(F.count("*").alias("d"))
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    # All divisions use Spark's integral `div` (== DuckDB `//` for the
    # all-positive values here) — no doubles anywhere in the iteration.
    base = (_SCALE * (_DAMP_DEN - _DAMP_NUM)) // _DAMP_DEN
    # Attach each edge's out-degree ONCE before the loop instead of
    # re-joining outdeg inside every round: the per-round work drops
    # from two joins to one, and the (src, dst, d) frame is the one
    # that persists across rounds (r12 optimization; share = r div d
    # per edge is unchanged, so the integer fixpoint is identical).
    eout = cached(edges.join(outdeg, "src").select("src", "dst", "d"))
    ranks = nodes.select("node", F.lit(_SCALE).cast("long").alias("r"))
    for _ in range(3):
        contrib = (
            eout.join(ranks, eout.src == ranks.node)
            .select("dst", F.expr("r div d").alias("share"))
        )
        incoming = contrib.groupBy("dst").agg(F.sum("share").alias("inc"))
        ranks = (
            nodes.join(incoming, nodes.node == incoming.dst, "left")
            .select(
                "node",
                (
                    F.lit(base).cast("long")
                    + F.expr(
                        f"({_DAMP_NUM} * coalesce(inc, 0L)) div {_DAMP_DEN}"
                    )
                ).alias("r"),
            )
        )
    return ranks.select("node", F.col("r").alias("rank_scaled"))


@register(
    "graph_triangle_count",
    oracle="""
    WITH dedges AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE c.c_nationkey <> s.s_nationkey
      GROUP BY 1, 2
    ),
    und AS (
      SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
      FROM dedges GROUP BY 1, 2
    )
    SELECT e1.a AS node_a, e1.b AS node_b, e2.b AS node_c
    FROM und e1
    JOIN und e2 ON e2.a = e1.b
    JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle enumeration over the undirected nation trade graph —
    the clustering-coefficient primitive (community density, spam-ring
    detection on transaction graphs).

    Canonical ordered-edge join: undirected edges normalized to
    (min, max), triangles found as a < b < c wedge-close joins — each
    triangle emitted exactly once, no post-hoc dedup.  At 100 TB the
    same two hash joins apply with degree-ordered orientation (orient
    edges low-degree → high-degree) to bound wedge fan-out on skewed
    graphs; the nation graph here is keyspace-sized but the plan is
    the general one.
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    edges = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst"))
        .distinct()
    )
    und = edges.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    und = cached(und)
    e1 = und.select(F.col("a").alias("node_a"), F.col("b").alias("node_b"))
    e2 = und.select(F.col("a").alias("w_b"), F.col("b").alias("node_c"))
    e3 = und.select(F.col("a").alias("c_a"), F.col("b").alias("c_b"))
    return (
        e1.join(e2, e1.node_b == e2.w_b)
        .join(e3, (F.col("c_a") == F.col("node_a")) & (F.col("c_b") == F.col("node_c")))
        .select("node_a", "node_b", "node_c")
    )


@register(
    "graph_degree_distribution",
    oracle="""
    WITH dedges AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE c.c_nationkey <> s.s_nationkey
      GROUP BY 1, 2
    ),
    deg AS (
      SELECT node, CAST(SUM(outd) AS BIGINT) AS out_degree,
             CAST(SUM(ind) AS BIGINT) AS in_degree
      FROM (
        SELECT src AS node, 1 AS outd, 0 AS ind FROM dedges
        UNION ALL
        SELECT dst AS node, 0 AS outd, 1 AS ind FROM dedges
      ) GROUP BY node
    )
    SELECT node, out_degree, in_degree, out_degree + in_degree AS total_degree
    FROM deg
    """,
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node in/out degree over the directed trade graph — the first
    diagnostic on any graph workload (skew here predicts hot keys in
    every downstream join; the degree-ordered orientation that
    ``graph_triangle_count`` cites reads exactly this table).

    One union + map-combined aggregate keyed by node — no joins at all.
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    edges = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst"))
        .distinct()
    )
    # ONE explode instead of unionAll(edges, edges): the union spelling
    # referenced the (uncached) 4-table join twice, executing it twice
    # (r12; the CC edge-build fix).  Same (node, outd, ind) multiset.
    both = edges.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("src").alias("node"),
                    F.lit(1).alias("outd"),
                    F.lit(0).alias("ind"),
                ),
                F.struct(
                    F.col("dst").alias("node"),
                    F.lit(0).alias("outd"),
                    F.lit(1).alias("ind"),
                ),
            )
        ).alias("e")
    ).select("e.node", "e.outd", "e.ind")
    return both.groupBy("node").agg(
        F.sum("outd").cast("long").alias("out_degree"),
        F.sum("ind").cast("long").alias("in_degree"),
        (F.sum("outd") + F.sum("ind")).cast("long").alias("total_degree"),
    )
