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
    import hashlib
    import os
    import shutil
    import tempfile

    # Bucket-file lifecycle (VERDICT r5): the layout is CONTENT-keyed —
    # sf_dir plus an mtime/size fingerprint of the source parquet — so
    # repeated sessions on the same testdata REUSE one bucketed write
    # instead of each paying (and leaking) their own.  Concurrency
    # stays safe without app-id keys: writers build into a private
    # staging dir and publish with an atomic os.rename; the loser of a
    # race just deletes its staging copy and reads the winner's files.
    # Catalog entries are per-session (in-memory catalog), created via
    # DDL over the shared external location — no metastore growth.
    fp_src = []
    for t in ("orders", "lineitem"):
        st = os.stat(os.path.join(sf_dir, f"{t}.parquet"))
        fp_src.append(f"{t}:{st.st_mtime_ns}:{st.st_size}")
    fp = hashlib.sha1(";".join(fp_src).encode()).hexdigest()[:12]
    key = sf_dir.strip("/").replace("/", "_").replace(".", "_")
    root = os.path.join(tempfile.gettempdir(), "fauna_buckets")
    final = os.path.join(root, f"{key}_{fp}")
    to_name, tl_name = f"b_orders_{key}_{fp}", f"b_lineitem_{key}_{fp}"

    if not os.path.isdir(final):
        app_id = spark.sparkContext.applicationId.replace("-", "_")
        staging = os.path.join(root, f"staging_{app_id}")
        shutil.rmtree(staging, ignore_errors=True)
        o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
        l = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        )
        for df, col, sub in ((o, "o_orderkey", "orders"), (l, "l_orderkey", "lineitem")):
            tmp_tbl = f"stage_{sub}_{app_id}"
            (
                df.write.mode("overwrite")
                .bucketBy(8, col)
                .sortBy(col)
                .format("parquet")
                .option("path", os.path.join(staging, sub))
                .saveAsTable(tmp_tbl)
            )
            # External table: DROP removes the catalog entry, files stay.
            spark.sql(f"DROP TABLE IF EXISTS {tmp_tbl}")
        os.makedirs(root, exist_ok=True)
        try:
            os.rename(staging, final)  # atomic publish
            # Prune bucket layouts of SUPERSEDED testdata generations
            # for this sf_dir (driver regenerates between rounds) so
            # /tmp growth is bounded at one layout per live generation.
            # Also sweep staging dirs older than an hour — a writer
            # that crashed between saveAsTable and the rename would
            # otherwise leak its copy forever (code-review r6); live
            # concurrent writers are minutes-old at most.
            import time

            for stale in os.listdir(root):
                path = os.path.join(root, stale)
                if stale.startswith(f"{key}_") and stale != f"{key}_{fp}":
                    shutil.rmtree(path, ignore_errors=True)
                elif stale.startswith("staging_"):
                    try:
                        if time.time() - os.path.getmtime(path) > 3600:
                            shutil.rmtree(path, ignore_errors=True)
                    except OSError:
                        pass
        except OSError:
            shutil.rmtree(staging, ignore_errors=True)  # lost the race
    if not spark.catalog.tableExists(to_name):
        spark.sql(
            f"""CREATE TABLE {to_name} (o_orderkey BIGINT, o_orderpriority STRING)
            USING PARQUET CLUSTERED BY (o_orderkey) SORTED BY (o_orderkey)
            INTO 8 BUCKETS LOCATION '{os.path.join(final, "orders")}'"""
        )
        spark.sql(
            f"""CREATE TABLE {tl_name}
            (l_orderkey BIGINT, l_extendedprice DOUBLE, l_discount DOUBLE)
            USING PARQUET CLUSTERED BY (l_orderkey) SORTED BY (l_orderkey)
            INTO 8 BUCKETS LOCATION '{os.path.join(final, "lineitem")}'"""
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
    median here is the audit, not the production path — and the audit
    itself is scale-safe: rank-at-median is computed with the bucketed
    two-phase rank (``ml_auc_ranksum`` shape), never a window
    partitioned solely by the 3-value returnflag key, which would
    funnel a third of the table through one task (VERDICT r5).
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    li = cached(li)
    approx = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx_median"),
        F.count("*").alias("n"),
    )
    # Two-phase exact rank: value-range buckets rank locally; a tiny
    # per-(flag, bucket) counts table (broadcast) shifts local ranks to
    # per-flag global ranks.  Ranks are exact integers, so the
    # decomposition reproduces the single-window spelling bit-for-bit.
    bucketed = li.withColumn(
        "bucket", F.floor(F.col("l_extendedprice") / F.lit(1000.0)).cast("long")
    )
    w_local = W.partitionBy("l_returnflag", "bucket").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    local = bucketed.withColumn("local_rn", F.row_number().over(w_local))
    from project_fauna_spark.functions.ranks import bucket_offsets

    offsets = bucket_offsets(
        bucketed, ["l_returnflag"], "bucket", F.lit(1), total_alias="nn"
    )
    exact = (
        local.join(F.broadcast(offsets), ["l_returnflag", "bucket"])
        .filter(
            F.col("offset") + F.col("local_rn") == F.floor((F.col("nn") + 1) / 2)
        )
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


@register(
    "llm_domain_mixture_weights",
    oracle="""
    WITH tok AS (
      SELECT lang, doc_id, len(string_split(text, ' ')) AS n_tok FROM documents
    ),
    per_lang AS (
      SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
      FROM tok GROUP BY lang
    ),
    tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS t, COUNT(*) AS n_langs
            FROM per_lang)
    SELECT lang, n_docs, n_tokens,
           CAST(n_tokens AS DOUBLE) / (SELECT t FROM tot) AS actual_share,
           CAST((SELECT t FROM tot) AS DOUBLE)
             / ((SELECT n_langs FROM tot) * n_tokens) AS sampling_weight
    FROM per_lang
    """,
)
def llm_domain_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing weights: per-language token shares and the sampling
    weight that rebalances the corpus to a uniform language mixture —
    the number a training-data loader multiplies into per-domain
    sampling probabilities (the DoReMi/uniform-mixture baseline).

    Token counts are exact longs aggregated map-combined; the compared
    edge is two deterministic double ratios per language.  At 100 TB
    this is one narrow scan + a language-keyed aggregate (dozens of
    groups), shuffling one row per language.
    """
    d = load_table(spark, sf_dir, "documents")
    per_lang = (
        d.select("lang", F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tok"))
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tok").alias("n_tokens"))
    )
    tot = per_lang.agg(
        F.sum("n_tokens").alias("t"), F.count("*").alias("n_langs")
    )
    return per_lang.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        "n_tokens",
        (F.col("n_tokens").cast("double") / F.col("t")).alias("actual_share"),
        (
            F.col("t").cast("double") / (F.col("n_langs") * F.col("n_tokens"))
        ).alias("sampling_weight"),
    )


_TARGET_FILE_BYTES = 128 * 1024 * 1024  # compaction target: 128 MiB files
_EST_ROW_BYTES = 128  # deterministic per-row size estimate for the plan


@register(
    "layout_compaction_plan",
    oracle=f"""
    SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m') AS ship_month,
           COUNT(*) AS n_rows,
           CAST(COUNT(*) * {_EST_ROW_BYTES} AS BIGINT) AS est_bytes,
           CAST(GREATEST(1, CAST(ceil(COUNT(*) * {_EST_ROW_BYTES}
               / CAST({_TARGET_FILE_BYTES} AS DOUBLE)) AS BIGINT)) AS BIGINT)
             AS target_files,
           CAST(ceil(COUNT(*) / CAST(GREATEST(1, CAST(ceil(COUNT(*) * {_EST_ROW_BYTES}
               / CAST({_TARGET_FILE_BYTES} AS DOUBLE)) AS BIGINT)) AS DOUBLE))
               AS BIGINT) AS rows_per_file
    FROM lineitem
    GROUP BY 1
    """,
)
def layout_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planner: per ship-month partition, the
    row count, estimated bytes, and the file count/size that hits the
    128 MiB target — the maintenance job every large parquet lake runs
    (OPTIMIZE/rewriteDataFiles produce exactly this plan before moving
    bytes).

    One map-combined aggregate over the partition column; integer
    math end-to-end (the single double division feeds a ceil), so the
    plan is bit-identical across engines.  At 100 TB the planner scans
    footer statistics, not data — this models the decision layer.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_shipdate")
    per_month = li.groupBy(
        F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM").alias("ship_month")
    ).agg(F.count("*").alias("n_rows"))
    est_bytes = F.col("n_rows") * _EST_ROW_BYTES
    target_files = F.greatest(
        F.lit(1).cast("long"),
        F.ceil(est_bytes / F.lit(float(_TARGET_FILE_BYTES))),
    )
    return per_month.select(
        "ship_month",
        "n_rows",
        est_bytes.cast("long").alias("est_bytes"),
        target_files.cast("long").alias("target_files"),
        F.ceil(F.col("n_rows") / target_files.cast("double"))
        .cast("long")
        .alias("rows_per_file"),
    )


@register(
    "dq_distribution_drift",
    oracle="""
    WITH halves AS (
      SELECT CAST(floor(value / 50) AS BIGINT) AS bin,
             CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN 'a' ELSE 'b' END AS half
      FROM events
    ),
    tot AS (
      SELECT COUNT(*) FILTER (WHERE half = 'a') AS ta,
             COUNT(*) FILTER (WHERE half = 'b') AS tb
      FROM halves
    ),
    bins AS (
      SELECT bin,
             COUNT(*) FILTER (WHERE half = 'a') AS n_a,
             COUNT(*) FILTER (WHERE half = 'b') AS n_b
      FROM halves GROUP BY bin
    ),
    shares AS (
      -- zero guards (ADVICE-r4 rule): a regenerated stream landing
      -- entirely in one half must yield NULL shares on BOTH engines,
      -- not an ANSI DIVIDE_BY_ZERO on the Spark side only
      SELECT bin, n_a, n_b,
             CASE WHEN (SELECT ta FROM tot) > 0
                  THEN CAST(n_a AS DOUBLE) / (SELECT ta FROM tot) END AS p_a,
             CASE WHEN (SELECT tb FROM tot) > 0
                  THEN CAST(n_b AS DOUBLE) / (SELECT tb FROM tot) END AS p_b
      FROM bins
    )
    SELECT bin, n_a, n_b, p_a, p_b,
           (p_a - p_b) * (p_a - p_b) / (p_a + p_b) AS chi2_component
    FROM shares
    """,
)
def dq_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift audit between the first and second half of
    the event stream: per value-bin counts, shares, and the chi-square
    drift component — the training-serving-skew / data-shift monitor
    (PSI's log is libm and banned at compared edges; the chi-square
    form is algebraically log-free and equally standard).

    One aggregate with conditional counts (no self-join of halves);
    per-bin doubles are exact integer ratios combined in one
    deterministic expression.  Bins are fixed-width — at 100 TB the
    bin map is a stateless projection and the shuffle carries ≤10
    rows per partition.
    """
    e = load_table(spark, sf_dir, "events").select("value", "ts")
    half = F.when(
        F.col("ts") < F.lit("2024-01-16 00:00:00").cast("timestamp"), "a"
    ).otherwise("b")
    halves = e.select(
        F.floor(F.col("value") / 50).cast("long").alias("bin"), half.alias("half")
    )
    halves = cached(halves)
    tot = halves.agg(
        F.sum((F.col("half") == "a").cast("long")).alias("ta"),
        F.sum((F.col("half") == "b").cast("long")).alias("tb"),
    )
    bins = halves.groupBy("bin").agg(
        F.sum((F.col("half") == "a").cast("long")).alias("n_a"),
        F.sum((F.col("half") == "b").cast("long")).alias("n_b"),
    )
    # zero guards mirror the oracle's CASE WHEN (ADVICE-r4 divide class):
    # a regenerated stream landing entirely in one half yields NULL
    # shares on both engines instead of a Spark-only ANSI error.
    pa = F.when(F.col("ta") > 0, F.col("n_a").cast("double") / F.col("ta"))
    pb = F.when(F.col("tb") > 0, F.col("n_b").cast("double") / F.col("tb"))
    return bins.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_a",
        "n_b",
        pa.alias("p_a"),
        pb.alias("p_b"),
        ((pa - pb) * (pa - pb) / (pa + pb)).alias("chi2_component"),
    )


@register(
    "graph_common_neighbors",
    oracle="""
    WITH e0 AS (
      SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      WHERE c.c_nationkey <> s.s_nationkey
    ),
    adj AS (
      SELECT src AS node, dst AS nb FROM e0
      UNION
      SELECT dst, src FROM e0
    ),
    deg AS (SELECT node, COUNT(*) AS d FROM adj GROUP BY node),
    inter AS (
      SELECT a.node AS node_a, b.node AS node_b, COUNT(*) AS n_common
      FROM adj a JOIN adj b ON a.nb = b.nb AND a.node < b.node
      GROUP BY a.node, b.node
    )
    SELECT node_a, node_b, n_common,
           CAST(n_common AS DOUBLE) / (da.d + db.d - n_common)
             AS neighbor_jaccard
    FROM inter
    JOIN deg da ON da.node = node_a
    JOIN deg db ON db.node = node_b
    """,
)
def graph_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction over the nation trade graph: common-neighbor
    count and neighbor-set Jaccard for every node pair sharing ≥1
    neighbor — the classic co-occurrence/link-prediction primitive.

    Same inverted-index shape as the shingle dedup: the self-join is
    EQUI on the shared neighbor (never all-pairs), the shuffle carries
    int keys, and the pair aggregate is map-combined.  At 100 TB the
    degree skew cap from the dedup path (drop hub nodes above a df
    threshold) applies verbatim if the graph has celebrity nodes.
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    e0 = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst"))
        .distinct()
    )
    # Symmetrize with ONE explode instead of union(e0, e0): the union
    # spelling references the 4-table join twice, so it executed twice
    # when `adj` first materialized (r12; same fix as the CC edge
    # build).  Identical row multiset → identical distinct set.
    adj = (
        e0.select(
            F.explode(
                F.array(
                    F.struct(F.col("src").alias("node"), F.col("dst").alias("nb")),
                    F.struct(F.col("dst").alias("node"), F.col("src").alias("nb")),
                )
            ).alias("e")
        )
        .select("e.node", "e.nb")
        .distinct()
    )
    adj = cached(adj)
    deg = adj.groupBy("node").agg(F.count("*").alias("d"))
    a = adj.select(F.col("node").alias("node_a"), "nb")
    b = adj.select(F.col("node").alias("node_b"), "nb")
    inter = (
        a.join(b, ["nb"])
        .filter(F.col("node_a") < F.col("node_b"))
        .groupBy("node_a", "node_b")
        .agg(F.count("*").alias("n_common"))
    )
    da = deg.select(F.col("node").alias("node_a"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("node_b"), F.col("d").alias("db"))
    return (
        inter.join(F.broadcast(da), "node_a")
        .join(F.broadcast(db), "node_b")
        .select(
            "node_a",
            "node_b",
            "n_common",
            (
                F.col("n_common").cast("double")
                / (F.col("da") + F.col("db") - F.col("n_common"))
            ).alias("neighbor_jaccard"),
        )
    )
