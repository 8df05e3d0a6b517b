"""Similarity search over the ``embeddings`` table (array<float>).

North-star surface (SURVEY.md §2b): brute-force cosine top-k as the
exactness baseline, a sign-bit LSH bucketed variant as the scale path,
and label-centroid scoring as the clustered/IVF pattern.

Cross-engine determinism: cosine is computed as an index-ordered left
fold in double (`F.aggregate` in Spark, `list_reduce` in DuckDB) —
float32 inputs cast exactly to double, identical operation order →
bit-identical results (verified: 0 mismatches over all pairs), so the
oracle can compare raw double similarity values, not just ids.

Scale design (100 TB):

* Brute-force per-query top-k is a broadcast of the (small) query set
  against a partitioned corpus scan — linear, no shuffle of the corpus,
  top-k folded per partition before the final merge.
* The LSH variant buckets by sign bits of leading dimensions: the join
  becomes equi on bucket id — candidates per query drop from N to
  N/2^bits, the classic recall/cost dial.  At real scale the bits come
  from random hyperplanes (see dedup.dedup_minhash_lsh for the hashed
  flavor); sign-of-dimension keeps it SQL-expressible so the oracle can
  check it exactly.
* Centroid scoring is the IVF pattern: one tiny centroid table
  (broadcast), one linear pass — exact decimal accumulation makes the
  centroid reproducible regardless of shuffle order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W, functions as F

from project_fauna_spark.functions.centroids import label_centroids, sql_centroid_ctes
from project_fauna_spark.functions.vectors import cosine_sim
from project_fauna_spark.io import load_table
from project_fauna_spark.plans.registry import register

# DuckDB spelling of the same index-ordered double fold (shared, non-
# registering home so other modules can use it without import-order side
# effects on the registry).
from project_fauna_spark.operators._oracle_shared import SQL_COS as _SQL_COS  # noqa: E402

_SQL_EMB_D = "list_transform(embedding, x -> CAST(x AS DOUBLE))"


@register(
    "sim_knn_brute_cosine",
    oracle=f"""
    WITH e AS (SELECT vec_id, {_SQL_EMB_D} AS emb FROM embeddings),
    q AS (SELECT vec_id AS query_id, emb AS qemb FROM e WHERE vec_id < 20),
    sims AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             {_SQL_COS.format(a='q.qemb', b='e.emb')} AS cos
      FROM q JOIN e ON e.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, cos, rank FROM (
      SELECT query_id, neighbor_id, cos,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos DESC, neighbor_id) AS INT) AS rank
      FROM sims
    ) WHERE rank <= 5
    """,
)
def sim_knn_brute_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for each of 20 query vectors.

    Broadcast the query set against a single linear corpus scan; the
    per-query top-k folds inside the window (WindowGroupLimit pushes
    the k-filter below the shuffle).
    """
    e = load_table(spark, sf_dir, "embeddings")
    corpus = e.select("vec_id", "embedding")
    queries = (
        e.filter(F.col("vec_id") < 20)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qemb"))
    )
    sims = (
        corpus.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine_sim(F.col("qemb"), F.col("embedding")).alias("cos"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), "neighbor_id")
    return sims.select(
        "query_id", "neighbor_id", "cos", F.row_number().over(w).alias("rank")
    ).filter(F.col("rank") <= 5)


def sign_bucket(emb: Column, bits: int = 6) -> Column:
    """LSH bucket id from the sign bits of the first ``bits`` dims."""
    out = F.lit(0)
    for i in range(bits):
        bit = F.when(F.element_at(emb, i + 1) >= 0, F.lit(1)).otherwise(F.lit(0))
        out = out * 2 + bit
    return out.cast("int")


@register(
    "sim_ann_lsh_bucketed",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, {_SQL_EMB_D} AS emb,
             CAST(
               (CASE WHEN embedding[1] >= 0 THEN 32 ELSE 0 END) +
               (CASE WHEN embedding[2] >= 0 THEN 16 ELSE 0 END) +
               (CASE WHEN embedding[3] >= 0 THEN 8 ELSE 0 END) +
               (CASE WHEN embedding[4] >= 0 THEN 4 ELSE 0 END) +
               (CASE WHEN embedding[5] >= 0 THEN 2 ELSE 0 END) +
               (CASE WHEN embedding[6] >= 0 THEN 1 ELSE 0 END) AS INT) AS bucket
      FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, emb AS qemb, bucket FROM e WHERE vec_id < 50),
    sims AS (
      SELECT q.query_id, e.vec_id AS neighbor_id, q.bucket,
             {_SQL_COS.format(a='q.qemb', b='e.emb')} AS cos
      FROM q JOIN e ON q.bucket = e.bucket AND e.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, bucket, cos, rank FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                        ORDER BY cos DESC, neighbor_id) AS INT) AS rank
      FROM sims
    ) WHERE rank <= 3
    """,
)
def sim_ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-3 neighbors: candidates share a 6-bit sign-LSH
    bucket, so the similarity join is EQUI on bucket id (shuffle by
    bucket, ~N/64 candidates per query) instead of a full scan."""
    e = load_table(spark, sf_dir, "embeddings")
    base = e.select("vec_id", "embedding", sign_bucket(F.col("embedding")).alias("bucket"))
    queries = (
        base.filter(F.col("vec_id") < 50)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qemb"),
            F.col("bucket").alias("qbucket"),
        )
    )
    sims = (
        base.join(
            queries,
            (F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "bucket",
            cosine_sim(F.col("qemb"), F.col("embedding")).alias("cos"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), "neighbor_id")
    return sims.select(
        "query_id", "neighbor_id", "bucket", "cos", F.row_number().over(w).alias("rank")
    ).filter(F.col("rank") <= 3)


# Fixed fold width for the two-level centroid accumulation (the shared
# functions/centroids helper: level 1 folds ≤ _FOLD_K vectors per
# (label, vec_id div K) bucket, level 2 folds the bucket partials in
# bucket order — bounded per-group state, deterministic order).
_FOLD_K = 256


@register(
    "sim_label_centroid",
    oracle=f"""
    WITH {sql_centroid_ctes(_FOLD_K)}
    SELECT e.vec_id, e.label,
           {_SQL_COS.format(a='e.emb', b='c.centroid')} AS cos_to_centroid
    FROM e JOIN cent c ON e.label = c.label
    """,
)
def sim_label_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine of every vector to its label centroid (IVF pattern).

    Centroid = elementwise mean via a TWO-LEVEL fixed-order fold:
    level 1 groups by (label, vec_id div {K}) and folds each bucket's
    ≤ {K} vectors in vec_id order; level 2 folds the bucket partials
    in bucket order.  Per-group state is bounded by the fold width at
    level 1 and by n/{K} partials at level 2 (add levels for more
    headroom) — no unbounded collect_list of a whole label's vectors.
    The fold order is fixed at both levels, so the double sums are
    reproducible AND bit-identical to the oracle's identical two-level
    fold.  (Decimal accumulation is not usable here: DuckDB's
    double→decimal cast rounds through a double multiply, so the two
    engines disagree in the last ulps.)  The centroid table is tiny →
    broadcast; scoring is one linear pass.
    """
    e = load_table(spark, sf_dir, "embeddings")
    cent = label_centroids(e, _FOLD_K)
    return (
        e.join(F.broadcast(cent), "label")
        .select(
            "vec_id",
            "label",
            cosine_sim(F.col("embedding"), F.col("centroid")).alias("cos_to_centroid"),
        )
    )


@register(
    "sim_radius_search",
    oracle=f"""
    WITH e AS (SELECT vec_id, {_SQL_EMB_D} AS emb FROM embeddings),
    q AS (SELECT vec_id AS query_id, emb AS qemb FROM e WHERE vec_id < 10)
    SELECT q.query_id, e.vec_id AS neighbor_id,
           {_SQL_COS.format(a='q.qemb', b='e.emb')} AS cos
    FROM q JOIN e ON e.vec_id <> q.query_id
    WHERE {_SQL_COS.format(a='q.qemb', b='e.emb')} >= 0.3
    """,
)
def sim_radius_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius (range) similarity search: ALL neighbors within cosine
    >= 0.3 of each query vector — the ε-ball companion of top-k kNN.

    Same broadcast-queries × linear-corpus-scan shape as
    ``sim_knn_brute_cosine``, but the selection is a predicate rather
    than a window: no shuffle at all after the scan (filter folds into
    the broadcast-join stage).  At 100 TB the scan parallelizes per
    file split; the query side stays a few KB."""
    e = load_table(spark, sf_dir, "embeddings")
    corpus = e.select("vec_id", "embedding")
    queries = (
        e.filter(F.col("vec_id") < 10)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qemb"))
    )
    return (
        corpus.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine_sim(F.col("qemb"), F.col("embedding")).alias("cos"),
        )
        .filter(F.col("cos") >= 0.3)
    )
