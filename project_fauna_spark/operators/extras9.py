"""Round-6 batch 3: ranking evaluation (nDCG), inter-annotator
agreement (Cohen's kappa), readability scoring, session bounce rate,
dedup threshold sweep.

Registered AFTER the round-6 grading window block (plans/__init__) —
new registrations must never perturb the first-50 window the driver
grades (pinned by tests/test_window_manifest.py).

Float-parity notes: nDCG's log2 discounts are computed ONCE in Python
and shipped as literals to both engines (the Benford/IVF-centroid
convention — libm at a compared edge is banned); kappa and the
threshold sweep are integer-exact until one division; Flesch is a
fixed-association expression over two integer-ratio divisions with
string-parsed double constants.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from project_fauna_spark.cache import cached
from project_fauna_spark.io import load_table
from project_fauna_spark.plans.registry import register

# --------------------------------------------------------------------------
# ml_ndcg_eval — label-relevance nDCG@5 of the IVF retriever
# --------------------------------------------------------------------------

_NDCG_K = 5
# 1/log2(i+1) discounts and their fixed-association prefix sums,
# computed in Python (IEEE doubles) and injected as literals into both
# engines — no libm call at any compared edge.
_NDCG_W = [1.0 / math.log2(i + 1) for i in range(1, _NDCG_K + 1)]
_NDCG_IDCG = []
_acc = 0.0
for _w in _NDCG_W:
    _acc = _acc + _w
    _NDCG_IDCG.append(_acc)


def _ndcg_oracle() -> str:
    from project_fauna_spark.plans.registry import ORACLE

    base = ORACLE["sim_ann_ivf"]
    dcg = " + ".join(
        f"(CASE WHEN r{i} = 1 THEN CAST('{_NDCG_W[i - 1]!r}' AS DOUBLE)"
        " ELSE CAST('0.0' AS DOUBLE) END)"
        for i in range(1, _NDCG_K + 1)
    )
    # fixed association ((((t1+t2)+t3)+t4)+t5 — SQL + is left-assoc, same
    # as the Spark column below.
    idcg_cases = " ".join(
        f"WHEN {n} THEN CAST('{_NDCG_IDCG[n - 1]!r}' AS DOUBLE)"
        for n in range(1, _NDCG_K + 1)
    )
    return f"""
    WITH base AS ({base}),
    lab AS (SELECT vec_id, label FROM embeddings),
    rel AS (
      SELECT b.query_id, b.rank,
             CASE WHEN ql.label = nl.label THEN 1 ELSE 0 END AS rel
      FROM base b
      JOIN lab ql ON ql.vec_id = b.query_id
      JOIN lab nl ON nl.vec_id = b.neighbor_id
    ),
    piv AS (
      SELECT query_id,
             {", ".join(f"COALESCE(MAX(CASE WHEN rank = {i} THEN rel END), 0) AS r{i}" for i in range(1, _NDCG_K + 1))}
      FROM rel GROUP BY query_id
    ),
    scored AS (
      SELECT query_id,
             CAST({" + ".join(f"r{i}" for i in range(1, _NDCG_K + 1))} AS BIGINT)
               AS n_rel,
             {dcg} AS dcg
      FROM piv
    )
    SELECT query_id, n_rel, dcg,
           CASE n_rel {idcg_cases} END AS idcg,
           CASE WHEN n_rel > 0
                THEN dcg / (CASE n_rel {idcg_cases} END) END AS ndcg
    FROM scored
    """


@register("ml_ndcg_eval", oracle_builder=_ndcg_oracle)
def ml_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@5 of the IVF retriever with label-match relevance — the
    standard offline ranking-quality metric for a search/recsys/RAG
    retrieval stage, computed per query against the exact same probe
    set ``sim_ann_ivf`` serves.

    The log2 position discounts (and the ideal-DCG prefix sums) are
    Python-computed literals identical in both engines; DCG is a
    fixed-association sum of ≤5 literal terms selected by 0/1
    relevance, so the compared doubles never touch libm.  Queries with
    zero relevant results yield NULL nDCG (0/0 guarded).

    Scale: rides the IVF candidate plan (broadcast codebook, cell equi
    join) plus two broadcast label joins and a 5-way pivot — the
    evaluation overhead is O(queries), independent of corpus size.
    """
    from project_fauna_spark.operators.llm_extras import sim_ann_ivf

    base = sim_ann_ivf(spark, sf_dir)
    lab = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    rel = (
        base.join(
            F.broadcast(lab.select(F.col("vec_id").alias("query_id"), F.col("label").alias("q_label"))),
            "query_id",
        )
        .join(
            F.broadcast(
                lab.select(
                    F.col("vec_id").alias("neighbor_id"), F.col("label").alias("n_label")
                )
            ),
            "neighbor_id",
        )
        .select(
            "query_id",
            "rank",
            (F.col("q_label") == F.col("n_label")).cast("int").alias("rel"),
        )
    )
    piv = rel.groupBy("query_id").agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("rank") == i, F.col("rel"))), F.lit(0)
            ).alias(f"r{i}")
            for i in range(1, _NDCG_K + 1)
        ]
    )
    n_rel = sum((F.col(f"r{i}") for i in range(2, _NDCG_K + 1)), F.col("r1"))
    dcg = None
    for i in range(1, _NDCG_K + 1):
        term = F.when(F.col(f"r{i}") == 1, F.lit(_NDCG_W[i - 1])).otherwise(
            F.lit(0.0)
        )
        dcg = term if dcg is None else dcg + term
    idcg = None
    for n in range(1, _NDCG_K + 1):
        branch = (F.col("n_rel") == n, F.lit(_NDCG_IDCG[n - 1]))
        idcg = F.when(*branch) if idcg is None else idcg.when(*branch)
    scored = piv.select(
        "query_id", n_rel.cast("long").alias("n_rel"), dcg.alias("dcg")
    )
    return scored.select(
        "query_id",
        "n_rel",
        "dcg",
        idcg.alias("idcg"),
        F.when(F.col("n_rel") > 0, F.col("dcg") / idcg).alias("ndcg"),
    )


# --------------------------------------------------------------------------
# llm_judge_agreement_kappa — inter-annotator agreement
# --------------------------------------------------------------------------


@register(
    "llm_judge_agreement_kappa",
    oracle="""
    WITH r AS (
      SELECT (n_chars > 300) AS a,
             (len(string_split(text, ' ')) > 55) AS b
      FROM documents
    ),
    c AS (
      SELECT COUNT(*) AS n,
             CAST(COUNT(*) FILTER (WHERE a AND b) AS BIGINT) AS n11,
             CAST(COUNT(*) FILTER (WHERE a AND NOT b) AS BIGINT) AS n10,
             CAST(COUNT(*) FILTER (WHERE NOT a AND b) AS BIGINT) AS n01,
             CAST(COUNT(*) FILTER (WHERE NOT a AND NOT b) AS BIGINT) AS n00
      FROM r
    )
    SELECT n, n11, n10, n01, n00,
           CASE WHEN n * n - ((n11 + n10) * (n11 + n01)
                              + (n01 + n00) * (n10 + n00)) <> 0
                THEN CAST(n * (n11 + n00)
                          - ((n11 + n10) * (n11 + n01)
                             + (n01 + n00) * (n10 + n00)) AS DOUBLE)
                     / (n * n - ((n11 + n10) * (n11 + n01)
                                 + (n01 + n00) * (n10 + n00)))
           END AS kappa
    FROM c
    """,
)
def llm_judge_agreement_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two deterministic document judges (length
    rater: n_chars > 300; verbosity rater: n_tokens > 55, both near
    the corpus medians) — the inter-annotator-agreement statistic every
    labeling/LLM-judge pipeline reports before trusting its labels.

    κ = (N·po − pe·N²)/(N² − pe·N²) is evaluated in the all-integer
    form (N·agree − Σ margins)/(N² − Σ margins): exact BIGINTs until
    ONE division, NULL when the raters are degenerate (pe = 1).  One
    map-combined conditional aggregate — a single corpus pass, 1-row
    shuffle at any scale; swapping in real judge columns (model A/B
    verdicts) keeps the identical plan.
    """
    d = load_table(spark, sf_dir, "documents")
    a = F.col("n_chars") > 300
    b = F.size(F.split(F.col("text"), " ")) > 55
    c = d.select(a.alias("a"), b.alias("b")).agg(
        F.count("*").alias("n"),
        F.sum((F.col("a") & F.col("b")).cast("long")).cast("long").alias("n11"),
        F.sum((F.col("a") & ~F.col("b")).cast("long")).cast("long").alias("n10"),
        F.sum((~F.col("a") & F.col("b")).cast("long")).cast("long").alias("n01"),
        F.sum((~F.col("a") & ~F.col("b")).cast("long")).cast("long").alias("n00"),
    )
    pe_num = (F.col("n11") + F.col("n10")) * (F.col("n11") + F.col("n01")) + (
        F.col("n01") + F.col("n00")
    ) * (F.col("n10") + F.col("n00"))
    denom = F.col("n") * F.col("n") - pe_num
    kappa = (
        (F.col("n") * (F.col("n11") + F.col("n00")) - pe_num).cast("double") / denom
    )
    return c.select(
        "n", "n11", "n10", "n01", "n00", F.when(denom != 0, kappa).alias("kappa")
    )


# --------------------------------------------------------------------------
# text_readability_flesch — Flesch reading-ease scoring
# --------------------------------------------------------------------------


@register(
    "text_readability_flesch",
    oracle="""
    WITH s AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_words,
             len(string_split(text, '. ')) AS n_sentences,
             len(regexp_extract_all(text, '[aeiouAEIOU]+')) AS n_syllables
      FROM documents
    ),
    f AS (
      SELECT doc_id, n_words, n_sentences, n_syllables,
             (CAST('206.835' AS DOUBLE)
              - (CAST('1.015' AS DOUBLE)
                 * (CAST(n_words AS DOUBLE) / n_sentences)))
             - (CAST('84.6' AS DOUBLE)
                * (CAST(n_syllables AS DOUBLE) / n_words)) AS flesch
      FROM s
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(n_sentences AS BIGINT) AS n_sentences,
           CAST(n_syllables AS BIGINT) AS n_syllables,
           flesch AS flesch_score,
           CASE WHEN flesch >= 60 THEN 'easy'
                WHEN flesch >= 30 THEN 'medium'
                ELSE 'hard' END AS band
    FROM f
    """,
)
def text_readability_flesch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document — the classic readability
    gate in corpus-quality stacks (alongside Gopher rules and the
    quality classifier), using vowel-group runs as the standard
    syllable proxy.

    Parity: words/sentences/syllable-groups are exact integer counts
    (identical regex semantics for ``[aeiouAEIOU]+`` in Java regex and
    RE2); the score is ONE fixed-association expression over two
    integer-ratio divisions, with all three Flesch constants
    string-parsed to identical doubles in both engines (a bare 206.835
    literal is DECIMAL in DuckDB — the VALUES-list 1-ulp trap).  The
    band is a comparison of identical doubles, so it can never straddle.
    Scale: a narrow map — no shuffle at all.
    """
    d = load_table(spark, sf_dir, "documents")
    n_words = F.size(F.split(F.col("text"), " "))
    n_sent = F.size(F.split(F.col("text"), r"\. "))
    n_syl = F.size(
        F.regexp_extract_all(F.col("text"), F.lit("[aeiouAEIOU]+"), F.lit(0))
    )
    s = d.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        n_sent.cast("long").alias("n_sentences"),
        n_syl.cast("long").alias("n_syllables"),
    )
    flesch = (
        F.lit(206.835)
        - (F.lit(1.015) * (F.col("n_words").cast("double") / F.col("n_sentences")))
    ) - (F.lit(84.6) * (F.col("n_syllables").cast("double") / F.col("n_words")))
    return s.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        flesch.alias("flesch_score"),
        F.when(flesch >= 60, "easy")
        .when(flesch >= 30, "medium")
        .otherwise("hard")
        .alias("band"),
    )


# --------------------------------------------------------------------------
# event_bounce_rate — single-event sessions per day
# --------------------------------------------------------------------------

_SESSION_GAP_S = 1800


@register(
    "event_bounce_rate",
    oracle=f"""
    WITH o AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                     > {_SESSION_GAP_S} * 1000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sess_id
      FROM o
    ),
    per_sess AS (
      SELECT user_id, sess_id, COUNT(*) AS n_events,
             CAST(date_trunc('day', MIN(ts)) AS DATE) AS day
      FROM s GROUP BY user_id, sess_id
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           COUNT(*) AS n_sessions,
           CAST(COUNT(*) FILTER (WHERE n_events = 1) AS BIGINT) AS n_bounces,
           CAST(COUNT(*) FILTER (WHERE n_events = 1) AS DOUBLE) / COUNT(*)
             AS bounce_rate
    FROM per_sess GROUP BY day
    """,
)
def event_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily bounce rate: fraction of sessions (30-min inactivity
    gap, the ``event_sessionize_lag_cumsum`` definition) containing
    exactly one event — the composed engagement metric product
    analytics reads first every morning.

    Sessionization windows partition by user_id (high-cardinality —
    never a funnel); the daily rollup is a map-combined conditional
    aggregate; the rate is one division of exact counts.  Session day
    = day of the session's FIRST event, so a midnight-straddling
    session counts once.
    """
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    new_sess = (
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
                > _SESSION_GAP_S * 1_000_000
            ),
            1,
        )
        .otherwise(0)
    )
    s = e.withColumn("new_sess", new_sess).withColumn(
        "sess_id",
        F.sum("new_sess").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    per_sess = s.groupBy("user_id", "sess_id").agg(
        F.count("*").alias("n_events"),
        F.to_date(F.date_trunc("day", F.min("ts"))).alias("day"),
    )
    bounce = (F.col("n_events") == 1).cast("long")
    return per_sess.groupBy(
        F.date_format("day", "yyyy-MM-dd").alias("day")
    ).agg(
        F.count("*").alias("n_sessions"),
        F.sum(bounce).cast("long").alias("n_bounces"),
        (F.sum(bounce).cast("double") / F.count("*")).alias("bounce_rate"),
    )


# --------------------------------------------------------------------------
# dedup_threshold_sweep — near-dup impact vs Jaccard threshold
# --------------------------------------------------------------------------


@register(
    "dedup_threshold_sweep",
    oracle_builder=lambda: _threshold_sweep_oracle(),
)
def dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup policy sweep: exact near-dup pair count and documents-
    dropped count at Jaccard thresholds 0.3 / 0.5 / 0.7, from ONE
    candidate pass — the measurement that picks a dedup threshold by
    its corpus impact (the ``sim_ivf_nprobe_sweep`` pattern applied to
    the dedup dial).

    The candidate stage is the df-capped inverted-index self-join run
    at the LOOSEST threshold (0.3 size-ratio prune + 0.3 capped-index
    gate, both spelled as integer cross-multiplications); exact
    verification computes integer (intersection, union) per surviving
    pair once, and the 3-threshold sweep is a tiny broadcast join
    filtering ``n_inter·10 ≥ n_union·t`` — still all-integer.
    Documents-dropped uses the min-id survivor rule (drop = appears as
    the higher id of any qualifying pair).
    """
    from pyspark.storagelevel import StorageLevel

    from project_fauna_spark.functions.shingles import (
        drop_hot_shingles as _drop_hot,
        shingle_hashes,
        shingles,
    )

    d = load_table(spark, sf_dir, "documents")
    hashed = d.select("doc_id", shingle_hashes(F.col("text")).alias("hsgl"))
    ex = hashed.select(
        "doc_id", F.size("hsgl").alias("n"), F.explode("hsgl").alias("h")
    )
    ex = cached(ex, StorageLevel.MEMORY_AND_DISK)
    exr = _drop_hot(ex)
    a, b = exr.alias("a"), exr.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("b.n") * 10 >= F.col("a.n") * 3)
            & (F.col("a.n") * 10 >= F.col("b.n") * 3),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
        )
        .agg(F.count("*").alias("n_inter_rare"))
        .filter(
            F.col("n_inter_rare") * 10
            >= (F.col("n_a") + F.col("n_b") - F.col("n_inter_rare")) * 3
        )
        .select("doc_a", "doc_b")
    )
    # Candidate-bounded verify (r12, the dedup_ngram_jaccard pattern):
    # persist the tiny pair set and semi-join the corpus down to
    # candidate ids before the interpreted shingle projection.
    cand = cached(cand)
    cand_ids = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .unionAll(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sh = (
        d.join(cand_ids, "doc_id", "left_semi")
        .select("doc_id", shingles(F.col("text")).alias("sgl"))
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("sgl").alias("sgl_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("sgl").alias("sgl_b"))
    n_inter = F.size(F.array_intersect("sgl_a", "sgl_b"))
    verified = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            n_inter.alias("ni"),
            (F.size("sgl_a") + F.size("sgl_b") - n_inter).alias("nu"),
        )
    )
    thresholds = spark.range(1).select(
        F.explode(F.array(F.lit(3), F.lit(5), F.lit(7))).alias("t")
    )
    swept = F.broadcast(thresholds).join(
        verified, F.col("ni") * 10 >= F.col("nu") * F.col("t")
    )
    return swept.groupBy("t").agg(
        F.count("*").alias("n_pairs"),
        F.countDistinct("doc_b").alias("n_docs_dropped"),
    ).select(
        (F.col("t").cast("double") / 10.0).alias("threshold"),
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.col("n_docs_dropped").cast("long").alias("n_docs_dropped"),
    )


def _threshold_sweep_oracle() -> str:
    from project_fauna_spark.operators._oracle_shared import (
        SQL_RARE_SHINGLES as _RARE,
        SQL_SHINGLES as _SH,
    )

    return f"""
    WITH sh AS ({_SH}),
    {_RARE},
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             len(list_intersect(ar.rsgl, br.rsgl)) AS n_inter_rare,
             len(list_intersect(a.sgl, b.sgl)) AS ni,
             len(a.sgl) + len(b.sgl) - len(list_intersect(a.sgl, b.sgl)) AS nu,
             len(a.sgl) AS n_a, len(b.sgl) AS n_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      JOIN rare ar ON ar.doc_id = a.doc_id
      JOIN rare br ON br.doc_id = b.doc_id
      WHERE len(list_intersect(ar.rsgl, br.rsgl)) > 0
    ),
    verified AS (
      SELECT doc_a, doc_b, ni, nu FROM inter
      WHERE n_inter_rare * 10 >= (n_a + n_b - n_inter_rare) * 3
    ),
    sweep(t) AS (VALUES (3), (5), (7))
    SELECT CAST(t AS DOUBLE) / 10.0 AS threshold,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT doc_b) AS BIGINT) AS n_docs_dropped
    FROM sweep JOIN verified ON ni * 10 >= nu * t
    GROUP BY t
    """
