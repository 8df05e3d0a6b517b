"""Round-6 batch 32: hard-negative mining and embedding-norm quality
audit.

Registered AFTER the round-6 grading window block (plans/__init__) —
new registrations must never perturb the first-50 window the driver
grades (pinned by tests/test_window_manifest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from project_fauna_spark.cache import cached
from project_fauna_spark.functions.vectors import cosine_sim
from project_fauna_spark.io import load_table
from project_fauna_spark.operators._oracle_shared import SQL_COS
from project_fauna_spark.plans.registry import dsum, register, sql_dsum

# --------------------------------------------------------------------------
# sim_hard_negative_mining — the contrastive-training data miner
# --------------------------------------------------------------------------

_HN_QUERIES = 20  # vec_id < 20 are the anchors


@register(
    "sim_hard_negative_mining",
    oracle=f"""
    WITH e AS (SELECT vec_id, label,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
               FROM embeddings),
    q AS (SELECT vec_id AS query_id, label AS qlabel, emb AS qemb
          FROM e WHERE vec_id < {_HN_QUERIES}),
    sims AS (
      SELECT q.query_id, q.qlabel, e.vec_id AS nid, e.label AS nlabel,
             {SQL_COS.format(a='q.qemb', b='e.emb')} AS cos
      FROM q JOIN e ON e.vec_id <> q.query_id
    ),
    neg AS (
      SELECT query_id,
             MAX(struct_pack(c := cos, i := nid)).i AS neg_id,
             MAX(struct_pack(c := cos, i := nid)).c AS neg_cos
      FROM sims WHERE nlabel <> qlabel GROUP BY query_id
    ),
    pos AS (
      SELECT query_id,
             MAX(struct_pack(c := cos, i := nid)).c AS pos_cos
      FROM sims WHERE nlabel = qlabel GROUP BY query_id
    )
    SELECT q.query_id, q.qlabel AS label, n.neg_id, n.neg_cos, p.pos_cos,
           p.pos_cos - n.neg_cos AS margin,
           p.pos_cos - n.neg_cos < 0 AS is_hard
    FROM q
    JOIN neg n ON n.query_id = q.query_id
    JOIN pos p ON p.query_id = q.query_id
    """,
)
def sim_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each anchor,
    the single most-similar vector of a DIFFERENT label (the hard
    negative that teaches the model the most), the best same-label
    similarity, and the margin between them — negative margin means
    the nearest neighbor is cross-label (``is_hard``), exactly the
    anchors a triplet-loss batch builder wants first
    (``ml_active_learning_margin`` ranks by classifier uncertainty;
    this ranks by EMBEDDING-space confusability).

    Cosines are the repo's index-ordered folds (bit-equal
    cross-engine); both argmaxes are lexicographic struct MAX over
    (cos, id) — order-independent, tie-broken by id, no
    first-row-wins window.  The margin is one subtraction of already
    bit-equal doubles.  Scale: broadcast anchors against one linear
    corpus scan; the per-anchor state is two struct accumulators, so
    this map-combines — no top-k heap, no shuffle wider than
    |anchors|.
    """
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    )
    q = e.filter(F.col("vec_id") < _HN_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("embedding").alias("qemb"),
    )
    sims = cached(
        F.broadcast(q)
        .join(e, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "qlabel",
            F.col("vec_id").alias("nid"),
            F.col("label").alias("nlabel"),
            cosine_sim(F.col("qemb"), F.col("embedding")).alias("cos"),
        )
    )
    best = F.max(F.struct(F.col("cos").alias("c"), F.col("nid").alias("i")))
    neg = (
        sims.filter(F.col("nlabel") != F.col("qlabel"))
        .groupBy("query_id", "qlabel")
        .agg(best.alias("b"))
        .select(
            "query_id",
            F.col("qlabel").alias("label"),
            F.col("b.i").alias("neg_id"),
            F.col("b.c").alias("neg_cos"),
        )
    )
    pos = (
        sims.filter(F.col("nlabel") == F.col("qlabel"))
        .groupBy("query_id")
        .agg(best.alias("b"))
        .select("query_id", F.col("b.c").alias("pos_cos"))
    )
    return neg.join(pos, "query_id").select(
        "query_id",
        "label",
        "neg_id",
        "neg_cos",
        "pos_cos",
        (F.col("pos_cos") - F.col("neg_cos")).alias("margin"),
        (F.col("pos_cos") - F.col("neg_cos") < 0).alias("is_hard"),
    )


# --------------------------------------------------------------------------
# dq_embedding_norm_audit — are the vectors fit for ANN?
# --------------------------------------------------------------------------

_NORM_SQL = (
    "sqrt(list_reduce(list_transform(list_transform(embedding,"
    " x -> CAST(x AS DOUBLE)), x -> x * x), (s, v) -> s + v))"
)


@register(
    "dq_embedding_norm_audit",
    oracle=f"""
    WITH n AS (
      SELECT label, {_NORM_SQL} AS nrm FROM embeddings
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(CASE WHEN nrm = 0.0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_zero_vectors,
           CAST(SUM(CASE WHEN abs(nrm - 1.0) <= 0.01 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_unit_norm,
           MIN(nrm) AS min_norm,
           MAX(nrm) AS max_norm,
           {sql_dsum('nrm', 30, 8)} / COUNT(*) AS mean_norm
    FROM n GROUP BY label
    """,
)
def dq_embedding_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-vector hygiene per label: L2-norm range and mean,
    zero-vector count (cosine is UNDEFINED on them — they crash or
    silently poison ANN indexes), and how many are already
    unit-normalized (±1 %) — the two-minute audit that decides whether
    the corpus needs a normalization pass before any of the ``sim_*``
    operators run, and whether dot-product can replace cosine.

    The norm is the index-ordered squared fold + one IEEE sqrt
    (bit-equal cross-engine), min/max compare identical doubles, and
    the mean uses the decimal-accumulate convention (float values →
    VARCHAR-routed decimal sum → one division).  Single scan,
    |labels|-sized output.
    """
    e = load_table(spark, sf_dir, "embeddings")
    d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    nrm = F.sqrt(
        F.aggregate(
            F.transform(d, lambda x: x * x), F.lit(0.0), lambda s, v: s + v
        )
    )
    return (
        e.select("label", nrm.alias("nrm"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.sum(F.when(F.col("nrm") == 0.0, 1).otherwise(0)).alias(
                "n_zero_vectors"
            ),
            F.sum(
                F.when(F.abs(F.col("nrm") - 1.0) <= 0.01, 1).otherwise(0)
            ).alias("n_unit_norm"),
            F.min("nrm").alias("min_norm"),
            F.max("nrm").alias("max_norm"),
            (dsum(F.col("nrm")) / F.count("*")).alias("mean_norm"),
        )
    )
