"""Round-5 additions: co-located bucketed joins, exact covariance,
corpus LM scoring, sentence segmentation, approx-percentile bounds.

Registered AFTER the round-5 grading window block (plans/__init__) —
new registrations must never perturb the first-50 window the driver
grades (pinned by tests/test_window_manifest.py).

Scale notes (100 TB):

* ``join_bucketed_colocate`` is the amortized-shuffle pattern: pay one
  bucketed write, then every subsequent join/aggregate on the bucket
  key runs exchange-free.  At warehouse scale this converts the
  biggest recurring shuffle (fact-fact joins) into local merges.
* ``ml_pca_covariance`` is one map-combined aggregate producing the
  d×d Gram/covariance statistics — the classic single-pass,
  shuffle-one-row pattern behind distributed PCA (compute moments in
  the cluster, eigendecompose the tiny matrix on the driver).
* ``llm_unigram_lm_score`` keeps everything integer until the final
  per-row division: corpus token counts join back to the token stream
  and aggregate as exact longs, so the compared edge is a single
  deterministic double op per row (no cross-row float accumulation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from project_fauna_spark.cache import cached
from project_fauna_spark.io import load_table
from project_fauna_spark.plans.registry import dsum, register, sql_dsum

_PCA_DIMS = 8  # moments for the leading 8 of the 64 embedding dims


def _cov_oracle() -> str:
    sums = []
    for i in range(1, _PCA_DIMS + 1):
        sums.append(f"{sql_dsum(f'CAST(embedding[{i}] AS DOUBLE)', 38, 15)} AS s{i}")
        for j in range(i, _PCA_DIMS + 1):
            sums.append(
                f"{sql_dsum(f'CAST(embedding[{i}] AS DOUBLE) * CAST(embedding[{j}] AS DOUBLE)', 38, 15)}"
                f" AS p{i}_{j}"
            )
    branches = " UNION ALL ".join(
        f"SELECT CAST({i} AS INT) AS dim_i, CAST({j} AS INT) AS dim_j, "
        f"(p{i}_{j} - s{i} * s{j} / n) / (n - 1) AS cov FROM m"
        for i in range(1, _PCA_DIMS + 1)
        for j in range(i, _PCA_DIMS + 1)
    )
    return f"""
    WITH m AS (SELECT COUNT(*) AS n, {', '.join(sums)} FROM embeddings)
    {branches}
    """


@register("ml_pca_covariance", oracle_builder=_cov_oracle)
def ml_pca_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact sample covariance of the leading 8 embedding dimensions —
    the distributed half of PCA (the driver-side eigendecomposition of
    an 8×8 matrix is trivial; producing its entries from 100 TB of
    vectors is the real work).

    One aggregate computes every first and second moment map-combined
    (partial aggregation per partition, one 1-row shuffle).  Per-row
    products are IEEE-deterministic doubles; cross-row sums accumulate
    in exact decimal and surface as doubles only at the edge, so both
    engines produce bit-identical covariances (the repo float-parity
    convention).  Output: the 36 upper-triangle (dim_i, dim_j, cov)
    entries.
    """
    e = load_table(spark, sf_dir, "embeddings")
    el = [F.element_at("embedding", i).cast("double") for i in range(1, _PCA_DIMS + 1)]
    aggs = [F.count("*").alias("n")]
    for i in range(_PCA_DIMS):
        aggs.append(dsum(el[i], 38, 15).alias(f"s{i + 1}"))
        for j in range(i, _PCA_DIMS):
            aggs.append(dsum(el[i] * el[j], 38, 15).alias(f"p{i + 1}_{j + 1}"))
    m = e.agg(*aggs)
    pair_structs = [
        F.struct(
            F.lit(i).alias("dim_i"),
            F.lit(j).alias("dim_j"),
            F.col(f"p{i}_{j}").alias("pij"),
            F.col(f"s{i}").alias("si"),
            F.col(f"s{j}").alias("sj"),
        )
        for i in range(1, _PCA_DIMS + 1)
        for j in range(i, _PCA_DIMS + 1)
    ]
    exploded = m.select("n", F.explode(F.array(*pair_structs)).alias("t"))
    return exploded.select(
        F.col("t.dim_i").alias("dim_i"),
        F.col("t.dim_j").alias("dim_j"),
        (
            (F.col("t.pij") - F.col("t.si") * F.col("t.sj") / F.col("n"))
            / (F.col("n") - F.lit(1))
        ).alias("cov"),
    )


@register(
    "join_bucketed_colocate",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_items,
           CAST(CAST(SUM(CAST(CAST((l.l_extendedprice * (1 - l.l_discount)) AS VARCHAR)
                 AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS revenue
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def join_bucketed_colocate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-table co-located join: orders and lineitem written
    ``bucketBy(8, orderkey)`` + sorted, then joined WITHOUT any
    exchange — the scan's bucketing satisfies the join's distribution
    requirement (tests/test_round5_properties pins zero Exchange under
    the merge hint).

    This is the 100 TB fact-fact join pattern: one bucketed write
    amortizes the shuffle across every later join/aggregate on the
    key.  The hinted SortMergeJoin makes the demonstration honest —
    without bucketing this plan would need two full exchanges.
    Results are exactly the plain join's (the oracle doesn't know the
    layout changed — that's the point).
    """
    import os
    import tempfile

    # Table names and external paths keyed by (sf_dir, application id):
    # concurrent sessions must never clobber each other's bucket files
    # (the ingest_partitioned_pruning lesson, ADVICE r4).
    app_id = spark.sparkContext.applicationId.replace("-", "_")
    key = sf_dir.strip("/").replace("/", "_").replace(".", "_")
    to_name, tl_name = f"b_orders_{key}_{app_id}", f"b_lineitem_{key}_{app_id}"
    base = os.path.join(tempfile.gettempdir(), f"fauna_buckets_{app_id}")
    if not spark.catalog.tableExists(to_name):
        o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
        l = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        )
        (
            o.write.mode("overwrite")
            .bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .format("parquet")
            .option("path", os.path.join(base, to_name))
            .saveAsTable(to_name)
        )
        (
            l.write.mode("overwrite")
            .bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .format("parquet")
            .option("path", os.path.join(base, tl_name))
            .saveAsTable(tl_name)
        )
    ob, lb = spark.table(to_name), spark.table(tl_name)
    joined = ob.hint("merge").join(lb, ob.o_orderkey == lb.l_orderkey)
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_items"),
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
    )


@register(
    "text_sentence_stats",
    oracle="""
    WITH s AS (
      SELECT doc_id,
             string_split(text, '. ') AS sents,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents
    )
    SELECT doc_id,
           CAST(len(sents) AS BIGINT) AS n_sentences,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_tokens AS DOUBLE) / len(sents) AS avg_sentence_tokens,
           CAST(list_max(list_transform(sents, x -> len(string_split(x, ' '))))
                AS BIGINT) AS max_sentence_tokens
    FROM s
    """,
)
def text_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation profile per document: sentence count,
    token count, mean and max sentence length — the text-quality
    features behind readability gates and chunk-size planning.

    Pure narrow expressions (split + HOF transform/array_max), no
    shuffle, no Python; the only double is a per-row integer ratio,
    deterministic in both engines.  The HOF lambda touches only its
    element (repo rule: outer references re-evaluate per element).
    """
    d = load_table(spark, sf_dir, "documents")
    sents = F.split(F.col("text"), "\\. ")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(sents).cast("long").alias("n_sentences"),
        F.size(toks).cast("long").alias("n_tokens"),
        (F.size(toks).cast("double") / F.size(sents)).alias("avg_sentence_tokens"),
        F.array_max(F.transform(sents, lambda s: F.size(F.split(s, " "))))
        .cast("long")
        .alias("max_sentence_tokens"),
    )


@register(
    "llm_unigram_lm_score",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    cnt AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
    tot AS (SELECT COUNT(*) AS t FROM tok),
    per_doc AS (
      SELECT tok.doc_id,
             COUNT(*) AS n_tokens,
             CAST(SUM(cnt.c) AS BIGINT) AS sum_token_count
      FROM tok JOIN cnt USING (w)
      GROUP BY tok.doc_id
    )
    SELECT doc_id, n_tokens, sum_token_count,
           CAST(sum_token_count AS DOUBLE)
             / (CAST((SELECT t FROM tot) AS DOUBLE) * n_tokens)
             AS mean_token_prob
    FROM per_doc
    """,
)
def llm_unigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-unigram LM fluency score per document: the mean corpus
    probability of the document's tokens — the cheap LM-likelihood
    gate (CCNet-style filtering uses exactly this shape with a wiki LM
    in place of the self-corpus).

    Everything stays integer until the final per-row division: token
    counts aggregate map-combined as longs, the corpus total is one
    broadcast scalar, and the compared edge is a single deterministic
    double expression — no cross-row float accumulation, no libm at
    the edge (repo float-parity rule).
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("w"))
    tok = cached(tok)
    cnt = tok.groupBy("w").agg(F.count("*").alias("c"))
    tot = tok.agg(F.count("*").alias("t"))
    per_doc = (
        tok.join(cnt, "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("c").alias("sum_token_count"),
        )
    )
    return per_doc.crossJoin(F.broadcast(tot)).select(
        "doc_id",
        "n_tokens",
        "sum_token_count",
        (
            F.col("sum_token_count").cast("double")
            / (F.col("t").cast("double") * F.col("n_tokens"))
        ).alias("mean_token_prob"),
    )


@register(
    "agg_approx_percentile_bound",
    oracle="""
    WITH r AS (
      SELECT l_returnflag, l_extendedprice,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n,
           l_extendedprice AS exact_median,
           TRUE AS approx_rank_in_band
    FROM r WHERE rn = (n + 1) // 2
    """,
)
def agg_approx_percentile_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable approximate percentile (Spark's GK/KLL-style
    ``percentile_approx`` sketch) graded bound-style: the edge carries
    the EXACT lower median (value at rank ⌈n/2⌉, replayed by DuckDB)
    plus an honestly-computed boolean — the true rank of the sketch's
    median estimate lies within ±1.5% of the target rank (accuracy
    10000 → rank error ≤ 1e-4; the band is 150× that) — which the
    oracle emits as literal TRUE.

    The sketch is the 100 TB percentile pattern: fixed-size partial
    state per partition, merged once, never a global sort.  The exact
    median here is the audit, not the production path.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    li = cached(li)
    approx = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx_median"),
        F.count("*").alias("n"),
    )
    w = W.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    exact = (
        li.withColumn("rn", F.row_number().over(w))
        .withColumn("nn", F.count("*").over(W.partitionBy("l_returnflag")))
        .filter(F.col("rn") == F.floor((F.col("nn") + 1) / 2))
        .select("l_returnflag", F.col("l_extendedprice").alias("exact_median"))
    )
    rank_of_approx = li.join(F.broadcast(approx), "l_returnflag").groupBy(
        "l_returnflag"
    ).agg(
        (
            F.sum((F.col("l_extendedprice") <= F.col("approx_median")).cast("long"))
            .cast("double")
            / F.count("*")
        ).alias("approx_rank_frac")
    )
    return (
        approx.join(exact, "l_returnflag")
        .join(rank_of_approx, "l_returnflag")
        .select(
            "l_returnflag",
            "n",
            "exact_median",
            (
                (F.col("approx_rank_frac") >= 0.485)
                & (F.col("approx_rank_frac") <= 0.515)
            ).alias("approx_rank_in_band"),
        )
    )
