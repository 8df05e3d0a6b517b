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

from project_fauna_spark.cache import cached
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


# --------------------------------------------------------------------------
# sim_matryoshka_prefix_recall / sim_ivf_nprobe_sweep — MRL funnel audit
# and IVF tuning curve (moved home from extras8 after their round-7
# driver grades, the moved-home rotation convention — see
# plans/__init__ docstring)
# --------------------------------------------------------------------------

_MRL_PREFIX = 16
_MRL_TOPK = 10
_MRL_QUERY_MOD = 100

_SQL_DOT_FULL = (
    "list_reduce(list_transform(range(1, len({a})+1),"
    " i -> {a}[i] * {b}[i]), (s, v) -> s + v)"
)
_SQL_DOT_PREFIX = (
    f"list_reduce(list_transform(range(1, {_MRL_PREFIX}+1),"
    " i -> {a}[i] * {b}[i]), (s, v) -> s + v)"
)


@register(
    "sim_matryoshka_prefix_recall",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, emb AS qemb FROM e
          WHERE vec_id % {_MRL_QUERY_MOD} = 0),
    pairs AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             {_SQL_DOT_FULL.format(a="q.qemb", b="e.emb")} AS dp_full,
             {_SQL_DOT_PREFIX.format(a="q.qemb", b="e.emb")} AS dp_prefix
      FROM q JOIN e ON e.vec_id <> q.query_id
    ),
    full_top AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY dp_full DESC, neighbor_id) AS rn
        FROM pairs) WHERE rn <= {_MRL_TOPK}
    ),
    prefix_top AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY dp_prefix DESC, neighbor_id) AS rn
        FROM pairs) WHERE rn <= {_MRL_TOPK}
    )
    SELECT f.query_id,
           CAST(COUNT(p.neighbor_id) AS BIGINT) AS n_overlap,
           CAST(COUNT(p.neighbor_id) AS DOUBLE) / {_MRL_TOPK} AS prefix_recall
    FROM full_top f
    LEFT JOIN prefix_top p
      ON p.query_id = f.query_id AND p.neighbor_id = f.neighbor_id
    GROUP BY f.query_id
    """,
)
def sim_matryoshka_prefix_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-embedding funnel audit: how much of the exact
    full-dimension top-10 survives when ranking uses only the leading
    16 of 64 dims — the number that says whether the MRL serving
    funnel (cheap prefix scan → full-dim rerank of survivors) can cut
    scan cost 4× at a given candidate multiplier.

    Both rankings are index-ordered double folds (``sim_ann_ivf``
    convention) with unique-id tie-breaks; recall is one division of
    exact integers.  Scale: queries are a fixed-modulus sample, so the
    truth join is broadcast-bounded; the production funnel this audits
    scans prefix dims for the corpus (¼ the bytes, same partitioning)
    and reranks only top-k·ε candidates at full width.
    """
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("emb")
    )
    q = e.filter(F.col("vec_id") % _MRL_QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
    )
    pairs = e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    dp_full = F.aggregate(
        F.zip_with("qemb", "emb", lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v
    )
    dp_prefix = F.aggregate(
        F.zip_with(
            F.slice("qemb", 1, _MRL_PREFIX),
            F.slice("emb", 1, _MRL_PREFIX),
            lambda x, y: x * y,
        ),
        F.lit(0.0),
        lambda s, v: s + v,
    )
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        dp_full.alias("dp_full"),
        dp_prefix.alias("dp_prefix"),
    )
    scored = cached(scored)
    w_full = W.partitionBy("query_id").orderBy(F.col("dp_full").desc(), "neighbor_id")
    w_pre = W.partitionBy("query_id").orderBy(
        F.col("dp_prefix").desc(), "neighbor_id"
    )
    full_top = (
        scored.withColumn("rn", F.row_number().over(w_full))
        .filter(F.col("rn") <= _MRL_TOPK)
        .select("query_id", "neighbor_id")
    )
    prefix_top = (
        scored.withColumn("rn", F.row_number().over(w_pre))
        .filter(F.col("rn") <= _MRL_TOPK)
        .select(
            F.col("query_id").alias("p_query_id"),
            F.col("neighbor_id").alias("p_neighbor_id"),
        )
    )
    return (
        full_top.join(
            prefix_top,
            (F.col("query_id") == F.col("p_query_id"))
            & (F.col("neighbor_id") == F.col("p_neighbor_id")),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count("p_neighbor_id").alias("n_overlap"),
            (F.count("p_neighbor_id").cast("double") / F.lit(float(_MRL_TOPK))).alias(
                "prefix_recall"
            ),
        )
    )


_SWEEP_MAX_NPROBE = 4
_SWEEP_TOPK = 5


def _nprobe_sweep_oracle() -> str:
    from project_fauna_spark.operators._oracle_shared import _ivf_sql_values

    dot = _SQL_DOT_FULL
    return f"""
    WITH cents(k, c) AS (VALUES {_ivf_sql_values()}),
    e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
    ),
    scored AS (
      SELECT e.vec_id, e.emb, cents.k,
             {dot.format(a="e.emb", b="cents.c")} AS dp
      FROM e CROSS JOIN cents
    ),
    assigned AS (
      SELECT vec_id, emb, k AS cell FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY dp DESC, k DESC) AS rn
        FROM scored) WHERE rn = 1
    ),
    probes AS (
      SELECT vec_id AS query_id, emb AS qemb, k AS cell, rn AS cell_rank FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY dp DESC, k DESC) AS rn
        FROM scored WHERE vec_id % {_MRL_QUERY_MOD} = 0)
      WHERE rn <= {_SWEEP_MAX_NPROBE}
    ),
    truth AS (
      SELECT query_id, neighbor_id FROM (
        SELECT p.query_id, e.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY p.query_id
                                  ORDER BY {dot.format(a="p.qemb", b="e.emb")} DESC,
                                           e.vec_id) AS rn
        FROM (SELECT DISTINCT query_id, qemb FROM probes) p
        JOIN e ON e.vec_id <> p.query_id) WHERE rn <= {_SWEEP_TOPK}
    ),
    cand AS (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             MIN(p.cell_rank) AS min_rank,
             {dot.format(a="p.qemb", b="a.emb")} AS dp
      FROM probes p JOIN assigned a USING (cell)
      WHERE a.vec_id <> p.query_id
      GROUP BY p.query_id, a.vec_id, {dot.format(a="p.qemb", b="a.emb")}
    ),
    sweep AS (SELECT unnest(range(1, {_SWEEP_MAX_NPROBE} + 1)) AS nprobe),
    ivf_top AS (
      SELECT nprobe, query_id, neighbor_id FROM (
        SELECT s.nprobe, c.query_id, c.neighbor_id,
               row_number() OVER (PARTITION BY s.nprobe, c.query_id
                                  ORDER BY c.dp DESC, c.neighbor_id) AS rn
        FROM sweep s JOIN cand c ON c.min_rank <= s.nprobe)
      WHERE rn <= {_SWEEP_TOPK}
    )
    SELECT s.nprobe,
           CAST((SELECT COUNT(DISTINCT query_id) FROM probes) AS BIGINT)
             AS n_queries,
           CAST(COUNT(i.neighbor_id) AS BIGINT) AS n_hits,
           CAST(COUNT(i.neighbor_id) AS DOUBLE)
             / ((SELECT COUNT(DISTINCT query_id) FROM probes) * {_SWEEP_TOPK})
             AS recall_at_{_SWEEP_TOPK}
    FROM sweep s
    CROSS JOIN truth t
    LEFT JOIN ivf_top i ON i.nprobe = s.nprobe
                       AND i.query_id = t.query_id
                       AND i.neighbor_id = t.neighbor_id
    GROUP BY s.nprobe
    """


@register("sim_ivf_nprobe_sweep", oracle_builder=_nprobe_sweep_oracle)
def sim_ivf_nprobe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF tuning curve: exact recall@5 against brute-force truth for
    nprobe = 1..4 — the measurement that picks an index's operating
    point (recall vs fraction-of-corpus-scanned), closing the IVF
    tuning loop the way ``dedup_minhash_recall_audit`` closes MinHash
    banding.

    Candidates are computed ONCE with each neighbor's best (lowest)
    probed-cell rank; the sweep is then a tiny range join on
    ``min_rank <= nprobe`` — probing 4 budgets costs one candidate
    pass, not four.  Hit counts are integers; recall is one division.
    Scale: truth is bounded to the fixed-modulus query sample
    (broadcast); the candidate join is EQUI on cell id; nothing
    all-pairs.
    """
    from project_fauna_spark.operators._oracle_shared import _IVF_K, _ivf_centroid

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("emb")
    )
    cents = spark.createDataFrame(
        [(k, _ivf_centroid(k)) for k in range(_IVF_K)], schema="k int, c array<double>"
    )
    dp_c = F.aggregate(
        F.zip_with("emb", "c", lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v
    )
    scored = e.crossJoin(F.broadcast(cents)).select(
        "vec_id", "emb", "k", dp_c.alias("dp")
    )
    w_cell = W.partitionBy("vec_id").orderBy(F.col("dp").desc(), F.col("k").desc())
    # Both the corpus assignment and the probe list read the ranked
    # frame — persist it so the codebook scoring + window run once.
    ranked = cached(scored.withColumn("rn", F.row_number().over(w_cell)))
    assigned = ranked.filter(F.col("rn") == 1).select(
        "vec_id", "emb", F.col("k").alias("cell")
    )
    probes = (
        ranked.filter(
            (F.col("vec_id") % _MRL_QUERY_MOD == 0) & (F.col("rn") <= _SWEEP_MAX_NPROBE)
        )
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("emb").alias("qemb"),
            F.col("k").alias("cell"),
            F.col("rn").alias("cell_rank"),
        )
    )
    probes = cached(probes)
    queries = probes.select("query_id", "qemb").distinct()
    dp_q = F.aggregate(
        F.zip_with("qemb", "emb", lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v
    )
    w_truth = W.partitionBy("query_id").orderBy(F.col("dp").desc(), "neighbor_id")
    truth = (
        e.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), dp_q.alias("dp"))
        .withColumn("rn", F.row_number().over(w_truth))
        .filter(F.col("rn") <= _SWEEP_TOPK)
        .select("query_id", "neighbor_id")
    )
    cand = (
        F.broadcast(probes)
        .join(assigned, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "cell_rank",
            dp_q.alias("dp"),
        )
        .groupBy("query_id", "neighbor_id", "dp")
        .agg(F.min("cell_rank").alias("min_rank"))
    )
    sweep = spark.range(1, _SWEEP_MAX_NPROBE + 1).select(
        F.col("id").cast("int").alias("nprobe")
    )
    w_ivf = W.partitionBy("nprobe", "query_id").orderBy(
        F.col("dp").desc(), "neighbor_id"
    )
    ivf_top = (
        F.broadcast(sweep)
        .join(cand, F.col("min_rank") <= F.col("nprobe"))
        .withColumn("rn", F.row_number().over(w_ivf))
        .filter(F.col("rn") <= _SWEEP_TOPK)
        .select(
            F.col("nprobe").alias("i_nprobe"),
            F.col("query_id").alias("i_query_id"),
            F.col("neighbor_id").alias("i_neighbor_id"),
        )
    )
    n_queries = queries.agg(F.count("*").alias("n_queries"))
    hits = (
        sweep.crossJoin(truth)
        .join(
            ivf_top,
            (F.col("i_nprobe") == F.col("nprobe"))
            & (F.col("i_query_id") == F.col("query_id"))
            & (F.col("i_neighbor_id") == F.col("neighbor_id")),
            "left",
        )
        .groupBy("nprobe")
        .agg(F.count("i_neighbor_id").alias("n_hits"))
    )
    return (
        hits.crossJoin(F.broadcast(n_queries))
        .select(
            "nprobe",
            F.col("n_queries").cast("long").alias("n_queries"),
            F.col("n_hits").cast("long").alias("n_hits"),
            (
                F.col("n_hits").cast("double")
                / (F.col("n_queries") * F.lit(_SWEEP_TOPK))
            ).alias(f"recall_at_{_SWEEP_TOPK}"),
        )
    )
