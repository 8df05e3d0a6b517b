"""Round-5 batch 2: product quantization, rank-sum AUC, closed-form
OLS, curriculum scheduling, tokenizer fertility, preference pairs,
and a cross-field expectation-suite audit.

Registered AFTER the round-5 grading window block (plans/__init__) —
new registrations must never perturb the first-50 window the driver
grades (pinned by tests/test_window_manifest.py).

Scale notes (100 TB):

* ``sim_pq_adc`` is THE memory story for web-scale ANN: a 64-dim
  float32 vector (256 B) compresses to 4 one-byte codes; search cost
  becomes a 32-entry lookup table sum instead of a 64-dim float scan.
  The codebook and the query→codeword distance LUT are broadcast-sized
  by construction (K·M entries), so the only shuffle carries
  (vec_id, subspace, code) ints.
* ``ml_auc_ranksum`` shows the distributed global-rank pattern: ranks
  come from value-range buckets (local window per bucket + a tiny
  broadcast bucket-offset table), never a single global window — the
  same two-phase cumsum as ``llm_pack_shards``, applied to a sort
  statistic.
* ``llm_curriculum_schedule`` is the same two-phase shape in the
  curriculum axis: per-language quality-descending token cumsum →
  fixed token-budget epochs, without a per-language single-partition
  window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from project_fauna_spark.cache import cached
from project_fauna_spark.io import load_table
from project_fauna_spark.plans.registry import dsum, register, sql_dsum

# --------------------------------------------------------------------------
# sim_pq_adc — product quantization with asymmetric-distance search
# --------------------------------------------------------------------------

_PQ_M = 4  # subspaces
_PQ_DSUB = 4  # dims per subspace (leading 16 of the 64 dims)
_PQ_K = 8  # codewords per subspace
_PQ_TOPK = 50


def _pq_codeword(s: int, c: int) -> list[float]:
    """Deterministic codeword: exact small rationals so both engines
    materialize bit-identical doubles from the same literals (the
    ``_ivf_centroid`` convention — a trained codebook changes recall,
    not the plan shape under test)."""
    return [((5 * c + 7 * s + 3 * d) % 11 - 5) / 5.0 for d in range(_PQ_DSUB)]


def _pq_query(s: int) -> list[float]:
    """Deterministic query subvector (same exact-rational convention)."""
    return [((3 * s + 2 * d) % 7 - 3) / 3.0 for d in range(_PQ_DSUB)]


def _pq_lut(s: int, c: int) -> float:
    """query→codeword squared distance, computed HERE in Python with
    the exact association order ``((d0+d1)+d2)+d3`` — Python floats are
    IEEE doubles, so injecting ``repr`` of this value as a literal into
    both engines is bit-exact by construction (no cross-engine float
    op at all for the LUT half of ADC)."""
    q, w = _pq_query(s), _pq_codeword(s, c)
    d = [(q[i] - w[i]) * (q[i] - w[i]) for i in range(_PQ_DSUB)]
    return ((d[0] + d[1]) + d[2]) + d[3]


def _pq_oracle() -> str:
    cb_rows = ", ".join(
        f"({s}, {c}, "
        + ", ".join(f"CAST('{x!r}' AS DOUBLE)" for x in _pq_codeword(s, c))
        + ")"
        for s in range(_PQ_M)
        for c in range(_PQ_K)
    )
    lut_rows = ", ".join(
        f"({s}, {c}, CAST('{_pq_lut(s, c)!r}' AS DOUBLE))"
        for s in range(_PQ_M)
        for c in range(_PQ_K)
    )
    # explicit association: ((d0+d1)+d2)+d3, matching the Spark column
    dist = (
        "(((x1-w1)*(x1-w1) + (x2-w2)*(x2-w2)) + (x3-w3)*(x3-w3))"
        " + (x4-w4)*(x4-w4)"
    )
    return f"""
    WITH sub AS (
      SELECT vec_id, g.s,
             CAST(embedding[g.s*{_PQ_DSUB} + 1] AS DOUBLE) AS x1,
             CAST(embedding[g.s*{_PQ_DSUB} + 2] AS DOUBLE) AS x2,
             CAST(embedding[g.s*{_PQ_DSUB} + 3] AS DOUBLE) AS x3,
             CAST(embedding[g.s*{_PQ_DSUB} + 4] AS DOUBLE) AS x4
      FROM embeddings, (SELECT unnest(range({_PQ_M})) AS s) g
    ),
    cb(s, c, w1, w2, w3, w4) AS (VALUES {cb_rows}),
    lut(s, c, qd) AS (VALUES {lut_rows}),
    dists AS (
      SELECT sub.vec_id, sub.s, cb.c, {dist} AS dist
      FROM sub JOIN cb ON cb.s = sub.s
    ),
    assigned AS (
      SELECT vec_id, s, c
      FROM (SELECT vec_id, s, c,
                   row_number() OVER (PARTITION BY vec_id, s
                                      ORDER BY dist, c) AS rn
            FROM dists)
      WHERE rn = 1
    ),
    pivoted AS (
      SELECT a.vec_id,
             MAX(CASE WHEN a.s = 0 THEN a.c END) AS code0,
             MAX(CASE WHEN a.s = 1 THEN a.c END) AS code1,
             MAX(CASE WHEN a.s = 2 THEN a.c END) AS code2,
             MAX(CASE WHEN a.s = 3 THEN a.c END) AS code3,
             MAX(CASE WHEN a.s = 0 THEN lut.qd END) AS q0,
             MAX(CASE WHEN a.s = 1 THEN lut.qd END) AS q1,
             MAX(CASE WHEN a.s = 2 THEN lut.qd END) AS q2,
             MAX(CASE WHEN a.s = 3 THEN lut.qd END) AS q3
      FROM assigned a JOIN lut ON lut.s = a.s AND lut.c = a.c
      GROUP BY a.vec_id
    )
    SELECT vec_id,
           CAST(code0 AS INT) AS code0, CAST(code1 AS INT) AS code1,
           CAST(code2 AS INT) AS code2, CAST(code3 AS INT) AS code3,
           ((q0 + q1) + q2) + q3 AS adc_dist
    FROM pivoted
    ORDER BY adc_dist, vec_id
    LIMIT {_PQ_TOPK}
    """


@register("sim_pq_adc", oracle_builder=_pq_oracle)
def sim_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jégou et al. IVFADC layout): encode
    the leading 16 embedding dims as 4 one-byte codes (4 subspaces × an
    8-codeword codebook), then answer a query via asymmetric distance —
    a 32-entry query→codeword LUT summed per vector — returning the
    top-50 nearest codes.

    Float-parity design: assignment distances are one fixed-association
    expression evaluated identically in both engines; the LUT is
    computed ONCE in Python (IEEE doubles) and injected as literals
    into both, so the compared ``adc_dist`` is a fixed-order sum of
    four literal-joined doubles.  Assignment ties break on the lowest
    codeword id.

    Scale: the codebook (32 rows) and LUT broadcast; per-vector work is
    M·K fixed expressions; the candidate shuffle carries only
    (vec_id, subspace, code) ints.  At 100 TB this is the compression
    layer under every billion-vector index — 64× smaller candidate
    state than raw float32 scan.
    """
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    subs = [
        F.struct(
            F.lit(s).alias("s"),
            *[
                F.element_at("embedding", s * _PQ_DSUB + i + 1)
                .cast("double")
                .alias(f"x{i + 1}")
                for i in range(_PQ_DSUB)
            ],
        )
        for s in range(_PQ_M)
    ]
    sub = e.select("vec_id", F.explode(F.array(*subs)).alias("t")).select(
        "vec_id", "t.*"
    )
    cb = spark.createDataFrame(
        [(s, c, *_pq_codeword(s, c)) for s in range(_PQ_M) for c in range(_PQ_K)],
        "s int, c int, w1 double, w2 double, w3 double, w4 double",
    )
    lut = spark.createDataFrame(
        [(s, c, _pq_lut(s, c)) for s in range(_PQ_M) for c in range(_PQ_K)],
        "s int, c int, qd double",
    )
    sq = lambda i: (F.col(f"x{i}") - F.col(f"w{i}")) * (  # noqa: E731
        F.col(f"x{i}") - F.col(f"w{i}")
    )
    dist = ((sq(1) + sq(2)) + sq(3)) + sq(4)
    w_assign = W.partitionBy("vec_id", "s").orderBy("dist", "c")
    assigned = (
        sub.join(F.broadcast(cb), "s")
        .withColumn("dist", dist)
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "s", "c")
    )
    pivoted = (
        assigned.join(F.broadcast(lut), ["s", "c"])
        .groupBy("vec_id")
        .agg(
            *[
                F.max(F.when(F.col("s") == s, F.col("c"))).alias(f"code{s}")
                for s in range(_PQ_M)
            ],
            *[
                F.max(F.when(F.col("s") == s, F.col("qd"))).alias(f"q{s}")
                for s in range(_PQ_M)
            ],
        )
    )
    adc = ((F.col("q0") + F.col("q1")) + F.col("q2")) + F.col("q3")
    return (
        pivoted.select(
            "vec_id",
            *[F.col(f"code{s}").cast("int").alias(f"code{s}") for s in range(_PQ_M)],
            adc.alias("adc_dist"),
        )
        .orderBy("adc_dist", "vec_id")
        .limit(_PQ_TOPK)
    )


# --------------------------------------------------------------------------
# ml_auc_ranksum — distributed one-vs-rest AUC via global rank buckets
# --------------------------------------------------------------------------

_AUC_BUCKET_SCALE = 16  # value-range buckets for the distributed rank


@register(
    "ml_auc_ranksum",
    oracle="""
    WITH scored AS (
      SELECT vec_id, label, CAST(embedding[1] AS DOUBLE) AS score
      FROM embeddings
    ),
    ranked AS (
      SELECT label,
             row_number() OVER (ORDER BY score, vec_id) AS rnk
      FROM scored
    ),
    tot AS (SELECT COUNT(*) AS n FROM scored),
    per_label AS (
      SELECT label,
             COUNT(*) AS n_pos,
             CAST(SUM(rnk) AS BIGINT) AS rank_sum
      FROM ranked GROUP BY label
    )
    SELECT label,
           CAST(n_pos AS BIGINT) AS n_pos,
           CAST((SELECT n FROM tot) - n_pos AS BIGINT) AS n_neg,
           rank_sum,
           CASE WHEN n_pos > 0 AND (SELECT n FROM tot) - n_pos > 0
                THEN CAST(2*rank_sum - n_pos*(n_pos+1) AS DOUBLE)
                     / (2 * n_pos * ((SELECT n FROM tot) - n_pos))
           END AS auc
    FROM per_label
    """,
)
def ml_auc_ranksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-vs-rest AUC per label via the Mann–Whitney rank-sum
    identity: AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺n⁻), with the first
    embedding dimension as the score — the standard exact distributed
    AUC (ties broken deterministically by vec_id, identically ranked
    in both engines).

    The global rank never uses a global window: scores bucket by value
    range, each bucket ranks locally, and a tiny broadcast
    bucket-offset table (one row per bucket, cumulated over dozens of
    rows) shifts local ranks to global — the ``llm_pack_shards``
    two-phase cumsum applied to a sort statistic.  All rank arithmetic
    is exact integers; the single double division is the edge.
    """
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.element_at("embedding", 1).cast("double").alias("score")
    )
    scored = e.withColumn(
        "bucket", F.floor(F.col("score") * _AUC_BUCKET_SCALE).cast("long")
    )
    scored = cached(scored)
    w_local = W.partitionBy("bucket").orderBy("score", "vec_id")
    local = scored.withColumn("local_rn", F.row_number().over(w_local))
    bucket_counts = scored.groupBy("bucket").agg(F.count("*").alias("bc"))
    w_off = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, -1)
    offsets = bucket_counts.select(
        "bucket", F.coalesce(F.sum("bc").over(w_off), F.lit(0)).alias("offset")
    )
    ranked = local.join(F.broadcast(offsets), "bucket").select(
        "label", (F.col("offset") + F.col("local_rn")).alias("rnk")
    )
    tot = scored.agg(F.count("*").alias("n"))
    per_label = ranked.groupBy("label").agg(
        F.count("*").alias("n_pos"), F.sum("rnk").alias("rank_sum")
    )
    n_pos, n_neg = F.col("n_pos"), F.col("n") - F.col("n_pos")
    return per_label.crossJoin(F.broadcast(tot)).select(
        "label",
        n_pos.cast("long").alias("n_pos"),
        n_neg.cast("long").alias("n_neg"),
        F.col("rank_sum").cast("long").alias("rank_sum"),
        F.when(
            (n_pos > 0) & (n_neg > 0),
            (2 * F.col("rank_sum") - n_pos * (n_pos + 1)).cast("double")
            / (2 * n_pos * n_neg),
        ).alias("auc"),
    )


# --------------------------------------------------------------------------
# ml_ols_fit — closed-form grouped linear regression from exact moments
# --------------------------------------------------------------------------


@register(
    "ml_ols_fit",
    oracle=f"""
    WITH m AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             {sql_dsum('l_quantity', 38, 12)} AS sx,
             {sql_dsum('l_extendedprice', 38, 12)} AS sy,
             {sql_dsum('l_quantity * l_quantity', 38, 12)} AS sxx,
             {sql_dsum('l_quantity * l_extendedprice', 38, 12)} AS sxy,
             {sql_dsum('l_extendedprice * l_extendedprice', 38, 12)} AS syy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n,
           CASE WHEN CAST(n AS DOUBLE) * sxx - sx * sx <> 0
                THEN (CAST(n AS DOUBLE) * sxy - sx * sy)
                     / (CAST(n AS DOUBLE) * sxx - sx * sx)
           END AS slope,
           CASE WHEN CAST(n AS DOUBLE) * sxx - sx * sx <> 0
                THEN (sy - (CAST(n AS DOUBLE) * sxy - sx * sy)
                           / (CAST(n AS DOUBLE) * sxx - sx * sx) * sx)
                     / CAST(n AS DOUBLE)
           END AS intercept,
           CASE WHEN (CAST(n AS DOUBLE) * sxx - sx * sx)
                     * (CAST(n AS DOUBLE) * syy - sy * sy) <> 0
                THEN ((CAST(n AS DOUBLE) * sxy - sx * sy)
                      * (CAST(n AS DOUBLE) * sxy - sx * sy))
                     / ((CAST(n AS DOUBLE) * sxx - sx * sx)
                        * (CAST(n AS DOUBLE) * syy - sy * sy))
           END AS r2
    FROM m
    """,
)
def ml_ols_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form simple linear regression per group (extendedprice on
    quantity, by returnflag): one map-combined pass computes the five
    exact decimal moments; slope/intercept/R² come out of the normal
    equations as deterministic double expressions.

    This is distributed ML-as-aggregation: 100 TB contributes moments
    (one row per group after partial aggregation), the model solve is
    free.  Per-row products are IEEE-deterministic doubles; cross-row
    sums accumulate in exact decimal and surface as doubles only at
    the edge; every division is zero-guarded symmetrically (the
    ADVICE-r4 divide class).
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").alias("x"),
        F.col("l_extendedprice").alias("y"),
    )
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        dsum(F.col("x"), 38, 12).alias("sx"),
        dsum(F.col("y"), 38, 12).alias("sy"),
        dsum(F.col("x") * F.col("x"), 38, 12).alias("sxx"),
        dsum(F.col("x") * F.col("y"), 38, 12).alias("sxy"),
        dsum(F.col("y") * F.col("y"), 38, 12).alias("syy"),
    )
    nd = F.col("n").cast("double")
    den_x = nd * F.col("sxx") - F.col("sx") * F.col("sx")
    den_y = nd * F.col("syy") - F.col("sy") * F.col("sy")
    num = nd * F.col("sxy") - F.col("sx") * F.col("sy")
    slope = num / den_x
    return m.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        F.when(den_x != 0, slope).alias("slope"),
        F.when(den_x != 0, (F.col("sy") - slope * F.col("sx")) / nd).alias(
            "intercept"
        ),
        F.when(den_x * den_y != 0, (num * num) / (den_x * den_y)).alias("r2"),
    )


# --------------------------------------------------------------------------
# llm_curriculum_schedule — quality-ordered token-budget epochs per lang
# --------------------------------------------------------------------------

_CURRICULUM_BUDGET = 4096  # tokens per curriculum epoch
_CURRICULUM_BAND = 100  # n_chars band width for the two-phase cumsum


@register(
    "llm_curriculum_schedule",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang, n_chars,
             len(string_split(text, ' ')) AS n_tok
      FROM documents
    ),
    cum AS (
      SELECT lang, n_chars, n_tok,
             SUM(n_tok) OVER (PARTITION BY lang
                              ORDER BY n_chars DESC, doc_id) AS cum_tok
      FROM tok
    )
    SELECT lang,
           CAST((cum_tok - n_tok) // {_CURRICULUM_BUDGET} AS BIGINT) AS epoch,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM cum
    GROUP BY lang, (cum_tok - n_tok) // {_CURRICULUM_BUDGET}
    """,
)
def llm_curriculum_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum scheduler: per language, documents ordered
    quality-descending (n_chars as the proxy, doc_id tie-break) are
    packed into fixed 4096-token epochs by a running token cumsum —
    the data-loader plan for quality-curriculum training (highest
    quality first, every epoch a fixed token budget).

    The per-language cumsum is two-phase, never a single-partition
    window: quality bands (n_chars div 100) cumsum locally, band
    totals cumulate in a tiny broadcast offset table (dozens of rows),
    and a doc's epoch is its global starting offset div budget.
    Integer math end-to-end.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "n_chars",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tok"),
    )
    # band index ascends as quality descends, so (band ASC, n_chars
    # DESC, doc_id ASC) is the curriculum order with banded prefixes
    d = d.withColumn(
        "band", (-F.floor(F.col("n_chars") / _CURRICULUM_BAND)).cast("long")
    )
    d = cached(d)
    w_local = W.partitionBy("lang", "band").orderBy(
        F.col("n_chars").desc(), "doc_id"
    )
    local = d.withColumn(
        "local_cum",
        F.sum("n_tok").over(w_local.rowsBetween(W.unboundedPreceding, 0)),
    )
    band_tot = d.groupBy("lang", "band").agg(F.sum("n_tok").alias("bt"))
    w_off = W.partitionBy("lang").orderBy("band").rowsBetween(
        W.unboundedPreceding, -1
    )
    offsets = band_tot.select(
        "lang", "band", F.coalesce(F.sum("bt").over(w_off), F.lit(0)).alias("offset")
    )
    cum = local.join(F.broadcast(offsets), ["lang", "band"]).withColumn(
        "start_tok", F.col("offset") + F.col("local_cum") - F.col("n_tok")
    )
    return (
        cum.withColumn(
            "epoch", F.floor(F.col("start_tok") / _CURRICULUM_BUDGET).cast("long")
        )
        .groupBy("lang", "epoch")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
            F.min("n_chars").cast("long").alias("min_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
        )
    )


# --------------------------------------------------------------------------
# llm_tokenizer_fertility — per-language subword fertility audit
# --------------------------------------------------------------------------

_SUBWORD_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


@register(
    "llm_tokenizer_fertility",
    oracle=f"""
    WITH t AS (
      SELECT lang,
             len(string_split(text, ' ')) AS n_words,
             len(regexp_extract_all(text, '{_SUBWORD_RE}')) AS n_subwords,
             n_chars
      FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS n_words,
           CAST(SUM(n_subwords) AS BIGINT) AS n_subwords,
           CASE WHEN SUM(n_words) > 0
                THEN CAST(SUM(n_subwords) AS DOUBLE) / SUM(n_words)
           END AS fertility,
           CASE WHEN SUM(n_subwords) > 0
                THEN CAST(SUM(n_chars) AS DOUBLE) / SUM(n_subwords)
           END AS chars_per_token
    FROM t GROUP BY lang
    """,
)
def llm_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: subword tokens per whitespace
    word and characters per subword — the multilingual token-budget
    metric (fertility >1.5 means a language pays more sequence length
    per word, skewing mixture budgets).

    The subword tokenizer is the GPT-2-style class split (letter runs,
    digit runs, single punctuation) counted with ``regexp_extract_all``
    on both engines — the pattern uses only literal classes, identical
    under Java regex and RE2.  Exact integer counts map-combine; the
    two ratios are the zero-guarded double edge.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "lang",
        "n_chars",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_words"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_SUBWORD_RE), 0)).cast(
            "long"
        ).alias("n_subwords"),
    )
    g = d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_words").alias("w"),
        F.sum("n_subwords").alias("s"),
        F.sum("n_chars").alias("ch"),
    )
    return g.select(
        "lang",
        "n_docs",
        F.col("w").cast("long").alias("n_words"),
        F.col("s").cast("long").alias("n_subwords"),
        F.when(F.col("w") > 0, F.col("s").cast("double") / F.col("w")).alias(
            "fertility"
        ),
        F.when(F.col("s") > 0, F.col("ch").cast("double") / F.col("s")).alias(
            "chars_per_token"
        ),
    )


# --------------------------------------------------------------------------
# llm_preference_pairs — per-source chosen/rejected pair mining (DPO prep)
# --------------------------------------------------------------------------


@register(
    "llm_preference_pairs",
    oracle="""
    WITH scored AS (
      SELECT source, doc_id,
             len(list_distinct(string_split(text, ' '))) AS score
      FROM documents
    ),
    ranked AS (
      SELECT source, doc_id, score,
             row_number() OVER (PARTITION BY source
                                ORDER BY score DESC, doc_id) AS rn_best,
             row_number() OVER (PARTITION BY source
                                ORDER BY score ASC, doc_id) AS rn_worst,
             COUNT(*) OVER (PARTITION BY source) AS n_docs
      FROM scored
    )
    SELECT b.source,
           b.doc_id AS chosen_doc_id,
           CAST(b.score AS BIGINT) AS chosen_score,
           w.doc_id AS rejected_doc_id,
           CAST(w.score AS BIGINT) AS rejected_score,
           CAST(b.score - w.score AS BIGINT) AS score_gap
    FROM (SELECT * FROM ranked WHERE rn_best = 1 AND n_docs >= 2) b
    JOIN (SELECT * FROM ranked WHERE rn_worst = 1) w USING (source)
    """,
)
def llm_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair mining for DPO/RLHF data prep: within each
    source, pair the highest-scoring document (chosen) with the
    lowest-scoring one (rejected), score = distinct-word count (an
    exact integer lexical-diversity proxy; swap in a reward model at
    production scale — the pairing plan is identical).

    Two row_number windows per source with deterministic (score,
    doc_id) tie-breaks; single-doc sources are excluded (no pair).
    Groups are source-sized — the groupBy shape, never a global
    window; integer math end-to-end.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        F.size(F.array_distinct(F.split(F.col("text"), " "))).cast("long").alias(
            "score"
        ),
    )
    d = cached(d)
    w_best = W.partitionBy("source").orderBy(F.col("score").desc(), "doc_id")
    w_worst = W.partitionBy("source").orderBy(F.col("score").asc(), "doc_id")
    ranked = (
        d.withColumn("rn_best", F.row_number().over(w_best))
        .withColumn("rn_worst", F.row_number().over(w_worst))
        .withColumn("n_docs", F.count("*").over(W.partitionBy("source")))
    )
    best = ranked.filter((F.col("rn_best") == 1) & (F.col("n_docs") >= 2)).select(
        "source",
        F.col("doc_id").alias("chosen_doc_id"),
        F.col("score").alias("chosen_score"),
    )
    worst = ranked.filter(F.col("rn_worst") == 1).select(
        "source",
        F.col("doc_id").alias("rejected_doc_id"),
        F.col("score").alias("rejected_score"),
    )
    return best.join(worst, "source").select(
        "source",
        "chosen_doc_id",
        "chosen_score",
        "rejected_doc_id",
        "rejected_score",
        (F.col("chosen_score") - F.col("rejected_score")).alias("score_gap"),
    )


# --------------------------------------------------------------------------
# dq_cross_field_rules — expectation-suite audit (cross-column + cross-table)
# --------------------------------------------------------------------------


@register(
    "dq_cross_field_rules",
    oracle="""
    SELECT 'discount_in_0_0.1' AS rule,
           COUNT(*) AS n_checked,
           COUNT(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.1)
             AS n_violations,
           CASE WHEN COUNT(*) > 0
                THEN CAST(COUNT(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.1)
                          AS DOUBLE) / COUNT(*) END AS violation_rate
    FROM lineitem
    UNION ALL
    SELECT 'tax_le_0.05', COUNT(*),
           COUNT(*) FILTER (WHERE l_tax > 0.05),
           CASE WHEN COUNT(*) > 0
                THEN CAST(COUNT(*) FILTER (WHERE l_tax > 0.05) AS DOUBLE)
                     / COUNT(*) END
    FROM lineitem
    UNION ALL
    SELECT 'qty_in_1_50', COUNT(*),
           COUNT(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50),
           CASE WHEN COUNT(*) > 0
                THEN CAST(COUNT(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50)
                          AS DOUBLE) / COUNT(*) END
    FROM lineitem
    UNION ALL
    SELECT 'extprice_positive', COUNT(*),
           COUNT(*) FILTER (WHERE l_extendedprice <= 0),
           CASE WHEN COUNT(*) > 0
                THEN CAST(COUNT(*) FILTER (WHERE l_extendedprice <= 0) AS DOUBLE)
                     / COUNT(*) END
    FROM lineitem
    UNION ALL
    SELECT 'totalprice_gt_2000', COUNT(*),
           COUNT(*) FILTER (WHERE o_totalprice <= 2000),
           CASE WHEN COUNT(*) > 0
                THEN CAST(COUNT(*) FILTER (WHERE o_totalprice <= 2000) AS DOUBLE)
                     / COUNT(*) END
    FROM orders
    UNION ALL
    SELECT 'ship_on_or_after_order', COUNT(*),
           COUNT(*) FILTER (WHERE l.l_shipdate < o.o_orderdate),
           CASE WHEN COUNT(*) > 0
                THEN CAST(COUNT(*) FILTER (WHERE l.l_shipdate < o.o_orderdate)
                          AS DOUBLE) / COUNT(*) END
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
)
def dq_cross_field_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation-suite audit (Great-Expectations shape): six
    cross-column and cross-table validation rules, each reporting
    checked/violation counts and the violation rate.

    The four lineitem rules and the orders rule evaluate in ONE
    map-combined conditional aggregate per table (a single scan, rows
    exploded from an array of rule structs — no per-rule re-scan); the
    cross-table temporal rule is the only join.  Counts are exact
    longs; rates are zero-guarded double edges.  At 100 TB the audit
    costs two scans plus one keyed join — the shape every data
    contract enforcement job runs nightly.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")

    def _viol(name: str, cond) -> F.Column:  # noqa: ANN001
        # coalesce: SUM over an empty table is NULL, but the oracle's
        # COUNT(*) FILTER is 0 — match that on empty input (ADVICE r5).
        return F.struct(
            F.lit(name).alias("rule"),
            F.count("*").alias("n_checked"),
            F.coalesce(F.sum(cond.cast("long")), F.lit(0)).alias("n_violations"),
        )

    li_rules = li.agg(
        F.array(
            _viol(
                "discount_in_0_0.1",
                (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1),
            ),
            _viol("tax_le_0.05", F.col("l_tax") > 0.05),
            _viol(
                "qty_in_1_50",
                (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50),
            ),
            _viol("extprice_positive", F.col("l_extendedprice") <= 0),
        ).alias("rules")
    ).select(F.explode("rules").alias("r"))
    o_rules = o.agg(
        F.array(_viol("totalprice_gt_2000", F.col("o_totalprice") <= 2000)).alias(
            "rules"
        )
    ).select(F.explode("rules").alias("r"))
    joined = li.join(o, li.l_orderkey == o.o_orderkey)
    j_rules = joined.agg(
        F.array(
            _viol("ship_on_or_after_order", F.col("l_shipdate") < F.col("o_orderdate"))
        ).alias("rules")
    ).select(F.explode("rules").alias("r"))
    out = li_rules.unionAll(o_rules).unionAll(j_rules)
    return out.select(
        F.col("r.rule").alias("rule"),
        F.col("r.n_checked").cast("long").alias("n_checked"),
        F.col("r.n_violations").cast("long").alias("n_violations"),
        F.when(
            F.col("r.n_checked") > 0,
            F.col("r.n_violations").cast("double") / F.col("r.n_checked"),
        ).alias("violation_rate"),
    )
