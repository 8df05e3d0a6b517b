"""Round-6 batch 31: distance-metric rank agreement and trade-graph
reciprocity.

Registered AFTER the round-6 grading window block (plans/__init__) —
new registrations must never perturb the first-50 window the driver
grades (pinned by tests/test_window_manifest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from project_fauna_spark.cache import cached
from project_fauna_spark.functions.vectors import cosine_sim
from project_fauna_spark.io import load_table
from project_fauna_spark.operators._oracle_shared import SQL_COS
from project_fauna_spark.plans.registry import register

# --------------------------------------------------------------------------
# sim_metric_rank_agreement — does the metric choice change the ranking?
# --------------------------------------------------------------------------

_RANK_QUERIES = 10  # vec_id < 10 are the probe queries
_RANK_POOL = 10  # top-k-by-cosine candidate pool per query

# DuckDB spelling of the index-ordered squared-L2 fold (monotone in the
# true distance, so ranks are identical and the sqrt is dropped).
_SQL_L2SQ = """
  list_reduce(list_transform(range(1, len({a})+1),
                             k -> ({a}[k] - {b}[k]) * ({a}[k] - {b}[k])),
              (s, v) -> s + v)
"""


@register(
    "sim_metric_rank_agreement",
    oracle=f"""
    WITH e AS (SELECT vec_id,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
               FROM embeddings),
    q AS (SELECT vec_id AS query_id, emb AS qemb FROM e
          WHERE vec_id < {_RANK_QUERIES}),
    sims AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             {SQL_COS.format(a='q.qemb', b='e.emb')} AS cos,
             {_SQL_L2SQ.format(a='q.qemb', b='e.emb')} AS l2sq
      FROM q JOIN e ON e.vec_id <> q.query_id
    ),
    cand AS (
      SELECT query_id, neighbor_id, l2sq,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, neighbor_id) AS cr
      FROM sims QUALIFY cr <= {_RANK_POOL}
    ),
    ranked AS (
      SELECT query_id, cr,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY l2sq, neighbor_id) AS lr
      FROM cand
    ),
    pairs AS (
      SELECT a.query_id,
             CAST(SUM(CASE WHEN a.lr < b.lr THEN 1 ELSE 0 END) AS BIGINT)
               AS n_concordant,
             CAST(SUM(CASE WHEN a.lr > b.lr THEN 1 ELSE 0 END) AS BIGINT)
               AS n_discordant,
             CAST(COUNT(*) AS BIGINT) AS n_pairs
      FROM ranked a JOIN ranked b
        ON a.query_id = b.query_id AND a.cr < b.cr
      GROUP BY 1
    )
    SELECT query_id, n_concordant, n_discordant,
           CAST(n_concordant - n_discordant AS DOUBLE)
             / CAST(n_pairs AS DOUBLE) AS kendall_tau
    FROM pairs
    """,
)
def sim_metric_rank_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall rank agreement between COSINE and EUCLIDEAN orderings of
    each query's candidate pool (top-10 by cosine): concordant /
    discordant pair counts and τ = (C − D)/pairs ∈ [−1, 1] — the audit
    that answers "can we switch the ANN index's metric without
    changing results?" (τ = 1 ⟺ identical ranking; on UNnormalized
    embeddings the two metrics genuinely disagree, which is exactly
    what this measures).

    Both similarity columns are the repo's index-ordered HOF folds
    (bit-equal cross-engine); Euclidean ranks use the SQUARED distance
    (monotone — the sqrt is dropped, one less float op).  Ranks are
    row_numbers with total tie-breaks, so the 45-pair-per-query
    self-join compares exact integers; τ is ONE IEEE division.
    Scale: the pool bound makes everything after the brute scan
    |queries|·k²-sized; the brute scan itself is the
    ``sim_knn_brute_cosine`` broadcast pattern.
    """
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    q = e.filter(F.col("vec_id") < _RANK_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qemb")
    )
    da = F.transform(F.col("qemb"), lambda x: x.cast("double"))
    db = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    l2sq = F.aggregate(
        F.zip_with(da, db, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda s, v: s + v,
    )
    sims = (
        F.broadcast(q)
        .join(e, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine_sim(F.col("qemb"), F.col("embedding")).alias("cos"),
            l2sq.alias("l2sq"),
        )
    )
    cr = F.row_number().over(
        W.partitionBy("query_id").orderBy(F.col("cos").desc(), "neighbor_id")
    )
    cand = sims.select("query_id", "neighbor_id", "l2sq", cr.alias("cr")).filter(
        F.col("cr") <= _RANK_POOL
    )
    lr = F.row_number().over(
        W.partitionBy("query_id").orderBy("l2sq", "neighbor_id")
    )
    ranked = cached(cand.select("query_id", "cr", lr.alias("lr")))
    a = ranked.select(
        F.col("query_id").alias("qa"), F.col("cr").alias("cra"), F.col("lr").alias("lra")
    )
    b = ranked.select(
        F.col("query_id").alias("qb"), F.col("cr").alias("crb"), F.col("lr").alias("lrb")
    )
    pairs = (
        a.join(b, (F.col("qa") == F.col("qb")) & (F.col("cra") < F.col("crb")))
        .groupBy(F.col("qa").alias("query_id"))
        .agg(
            F.sum(F.when(F.col("lra") < F.col("lrb"), 1).otherwise(0)).alias(
                "n_concordant"
            ),
            F.sum(F.when(F.col("lra") > F.col("lrb"), 1).otherwise(0)).alias(
                "n_discordant"
            ),
            F.count("*").alias("n_pairs"),
        )
    )
    return pairs.select(
        "query_id",
        F.col("n_concordant").cast("long").alias("n_concordant"),
        F.col("n_discordant").cast("long").alias("n_discordant"),
        (
            (F.col("n_concordant") - F.col("n_discordant")).cast("double")
            / F.col("n_pairs").cast("double")
        ).alias("kendall_tau"),
    )


# --------------------------------------------------------------------------
# graph_reciprocity — is trade mutual?
# --------------------------------------------------------------------------


@register(
    "graph_reciprocity",
    oracle="""
    WITH edges AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE c.c_nationkey <> s.s_nationkey
      GROUP BY 1, 2
    ),
    m AS (
      SELECT e.src, e.dst,
             EXISTS (SELECT 1 FROM edges r
                     WHERE r.src = e.dst AND r.dst = e.src) AS mutual
      FROM edges e
    )
    SELECT src AS node,
           CAST(COUNT(*) AS BIGINT) AS out_deg,
           CAST(SUM(CASE WHEN mutual THEN 1 ELSE 0 END) AS BIGINT)
             AS n_reciprocal,
           CAST(SUM(CASE WHEN mutual THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS reciprocity
    FROM m GROUP BY src
    """,
)
def graph_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation reciprocity of the directed trade graph (the
    ``graph_pagerank_trade`` edge set): of each nation's outgoing
    buy-from edges, how many are matched by a reverse edge — the
    mutual-relationship share that separates hub-and-spoke trade from
    balanced exchange (``q_nation_trade_balance`` weighs the VALUE
    imbalance; reciprocity is the pure topology version).

    The mutuality test is one edge self-join on the flipped key pair
    (mark-exists via left-semi-style aggregation), then a node-keyed
    rollup; the rate is ONE IEEE division of exact counts.  Scale:
    edges aggregate once map-combined; the flip join is keyed on
    (src, dst) — co-partitionable, never all-pairs.
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    edges = cached(
        o.join(c, o.o_custkey == c.c_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst"))
        .distinct()
    )
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    out = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    rec = (
        edges.intersect(rev)
        .groupBy("src")
        .agg(F.count("*").alias("n_rec"))
    )
    n_rec = F.coalesce(F.col("n_rec"), F.lit(0)).cast("long")
    return out.join(rec, "src", "left").select(
        F.col("src").alias("node"),
        "out_deg",
        n_rec.alias("n_reciprocal"),
        (n_rec.cast("double") / F.col("out_deg").cast("double")).alias(
            "reciprocity"
        ),
    )
