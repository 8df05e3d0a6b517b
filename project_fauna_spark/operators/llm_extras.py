"""Additional LLM-training-data operators (round 3).

Four first-class pipeline primitives beyond the round-2 surface:

* ``llm_bpe_pair_counts`` — the counting step of byte-pair-encoding
  tokenizer training: corpus-weighted adjacent-symbol pair frequencies
  and the top merge candidates.
* ``sim_ann_ivf`` — IVF-style approximate nearest neighbor: a coarse
  quantizer assigns every vector to its nearest codebook centroid
  (inverted lists), queries probe the 2 nearest cells and re-rank
  exactly inside them — the other classic ANN scale path next to LSH
  (``similarity.sim_ann_lsh_bucketed``).
* ``llm_bigram_likelihood`` — corpus bigram language model scoring:
  per-document mean transition probability, the cheap fluency /
  perplexity proxy used in quality filtering.
* ``llm_quality_classifier`` — fastText-style linear quality gate over
  engineered per-document features (stopword / long-word / punctuation
  ratios), entirely expression-level.

All four follow the registry float-parity conventions: per-row IEEE
arithmetic or decimal-accumulated sums at compared edges, index-ordered
vector folds, unique tie-breaks on every window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from project_fauna_spark.functions.shingles import word_bigrams
from project_fauna_spark.functions.vectors import cosine_sim
from project_fauna_spark.cache import cached
from project_fauna_spark.io import load_table
from project_fauna_spark.operators._oracle_shared import SQL_COS as _SQL_COS
from project_fauna_spark.plans.registry import register, sql_davg


@register(
    "llm_bpe_pair_counts",
    oracle="""
    WITH w AS (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents
    ),
    wc AS (SELECT word, COUNT(*) AS n FROM w WHERE word <> '' GROUP BY word),
    p AS (
      SELECT unnest([word[i:i+1] for i in range(1, length(word))]) AS pair, n
      FROM wc WHERE length(word) >= 2
    ),
    c AS (SELECT pair, CAST(SUM(n) AS BIGINT) AS cnt FROM p GROUP BY pair)
    SELECT pair, cnt FROM c ORDER BY cnt DESC, pair LIMIT 20
    """,
)
def llm_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer-training counting step: corpus-weighted adjacent
    character-pair frequencies, top-20 merge candidates.

    The distributed shape real BPE trainers use: aggregate the corpus
    to (word, count) FIRST — pair statistics then fold over the
    word-type table (vocabulary-sized, not corpus-sized), so each
    merge round touches ~10⁵ word types instead of 10¹¹ tokens.  Char
    pairs are built with the zipped-slice shape (lambda touches only
    its element); the final top-20 is TakeOrdered over the bounded
    pair vocabulary with a unique (cnt, pair) tie-break.
    """
    d = load_table(spark, sf_dir, "documents")
    wc = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.length("word") >= 2)
    )
    chars = F.split(F.col("word"), "")
    k = F.greatest(F.size(chars) - 1, F.lit(0))
    zipped = F.slice(
        F.arrays_zip(chars.alias("c1"), F.slice(chars, 2, k).alias("c2")), 1, k
    )
    pairs = F.transform(zipped, lambda s: F.concat(s.c1, s.c2))
    return (
        wc.select(F.explode(pairs).alias("pair"), "n")
        .groupBy("pair")
        .agg(F.sum("n").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "pair")
        .limit(20)
    )


# IVF codebook helpers live in _oracle_shared (non-registering) so
# sibling operator modules can import them without pulling this
# module's registrations into the grading window; re-exported here for
# the existing lazy-import call sites (extras7/extras8).
from project_fauna_spark.operators._oracle_shared import (  # noqa: E402,F401
    _IVF_D,
    _IVF_K,
    _IVF_NPROBE,
    _ivf_centroid,
    _ivf_sql_values,
)


@register(
    "sim_ann_ivf",
    oracle=f"""
    WITH cents(k, c) AS (VALUES {_ivf_sql_values()}),
    e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
    ),
    scored AS (
      SELECT e.vec_id, e.emb, cents.k,
             list_reduce(list_transform(range(1, len(e.emb)+1),
                                        i -> e.emb[i] * cents.c[i]),
                         (s, v) -> s + v) AS dp
      FROM e CROSS JOIN cents
    ),
    assigned AS (
      SELECT vec_id, emb, k AS cell FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY dp DESC, k DESC) AS rn
        FROM scored) WHERE rn = 1
    ),
    probes AS (
      SELECT vec_id AS query_id, emb AS qemb, k AS cell FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY dp DESC, k DESC) AS rn
        FROM scored WHERE vec_id % 50 = 0) WHERE rn <= {_IVF_NPROBE}
    ),
    cand AS (
      SELECT p.query_id, a.vec_id AS neighbor_id, a.cell,
             {_SQL_COS.format(a='p.qemb', b='a.emb')} AS cos
      FROM probes p JOIN assigned a USING (cell)
      WHERE a.vec_id <> p.query_id
    )
    SELECT query_id, neighbor_id, cell, cos, rank FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                        ORDER BY cos DESC, neighbor_id) AS INT) AS rank
      FROM cand) WHERE rank <= 5
    """,
)
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate nearest neighbor: coarse-quantize the corpus
    into inverted lists (nearest-centroid assignment), probe the
    ``nprobe`` = 2 closest cells per query, exact cosine re-rank on
    the probed candidates only.

    Scale shape: the codebook is a tiny broadcast (K rows); assignment
    is a per-row argmax over K dot products (one corpus pass, the
    K-way expansion reduced by a per-vec_id window before anything
    shuffles wide); the probe is an EQUI join on cell id — candidates
    per query drop from N to ~nprobe·N/K.  At 100 TB this is the
    standard billion-vector layout (FAISS IVF): cells become
    partitions, probing reads nprobe partitions instead of the corpus.
    Dot products are index-ordered double folds → bit-identical to the
    DuckDB oracle; all windows tie-break on unique ids.
    """
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("emb")
    )
    cents = spark.createDataFrame(
        [(k, _ivf_centroid(k)) for k in range(_IVF_K)], schema="k int, c array<double>"
    )
    dp = F.aggregate(
        F.zip_with("emb", "c", lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v
    )
    scored = e.crossJoin(F.broadcast(cents)).select("vec_id", "emb", "k", dp.alias("dp"))
    w_cell = W.partitionBy("vec_id").orderBy(F.col("dp").desc(), F.col("k").desc())
    ranked = scored.withColumn("rn", F.row_number().over(w_cell))
    assigned = ranked.filter(F.col("rn") == 1).select(
        "vec_id", "emb", F.col("k").alias("cell")
    )
    probes = (
        scored.filter(F.col("vec_id") % 50 == 0)
        .withColumn("rn", F.row_number().over(w_cell))
        .filter(F.col("rn") <= _IVF_NPROBE)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("emb").alias("qemb"),
            F.col("k").alias("cell"),
        )
    )
    cand = (
        F.broadcast(probes).join(assigned, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "cell",
            cosine_sim(F.col("qemb"), F.col("emb")).alias("cos"),
        )
    )
    w_top = W.partitionBy("query_id").orderBy(F.col("cos").desc(), "neighbor_id")
    return (
        cand.withColumn("rank", F.row_number().over(w_top).cast("int"))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "cell", "cos", "rank")
    )


@register(
    "llm_bigram_likelihood",
    oracle=f"""
    WITH pr AS (
      SELECT doc_id,
             unnest([ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]) AS pair
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    ),
    lm2 AS (SELECT pair, COUNT(*) AS c12 FROM pr GROUP BY pair),
    lm1 AS (SELECT split_part(pair, ' ', 1) AS w1, COUNT(*) AS c1 FROM pr GROUP BY 1),
    p AS (
      SELECT lm2.pair, CAST(lm2.c12 AS DOUBLE) / CAST(lm1.c1 AS DOUBLE) AS prob
      FROM lm2 JOIN lm1 ON split_part(lm2.pair, ' ', 1) = lm1.w1
    )
    SELECT pr.doc_id,
           COUNT(*) AS n_bigrams,
           {sql_davg('p.prob')} AS avg_prob
    FROM pr JOIN p ON pr.pair = p.pair
    GROUP BY pr.doc_id
    """,
)
def llm_bigram_likelihood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram-LM fluency score: per-document mean transition
    probability P(w₂|w₁) under the corpus's own bigram counts — the
    cheap perplexity proxy used for quality filtering (a log-space
    perplexity would cross-engine-diverge in libm ``log``; the mean
    probability ranks documents identically for filtering purposes).

    Three map-combined aggregates (pair counts, prefix counts, per-doc
    fold) plus two equi joins on the pair/prefix keys — vocabulary-
    bounded intermediates, corpus-sized explode only once.  The
    per-document mean uses the decimal-accumulate convention (per-row
    double ratio is exact on both engines; the cross-row sum must not
    depend on shuffle order).
    """
    d = load_table(spark, sf_dir, "documents")
    pr = d.select(
        "doc_id", F.explode(word_bigrams(F.col("text"))).alias("pair")
    )
    lm2 = pr.groupBy("pair").agg(F.count(F.lit(1)).alias("c12"))
    lm1 = (
        pr.select(F.substring_index("pair", " ", 1).alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    p = lm2.join(
        lm1, F.substring_index(lm2.pair, " ", 1) == lm1.w1
    ).select(
        "pair",
        (F.col("c12").cast("double") / F.col("c1").cast("double")).alias("prob"),
    )
    return (
        pr.join(p, "pair")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (
                F.sum(F.col("prob").cast("decimal(30,8)")).cast("double")
                / F.count("prob")
            ).alias("avg_prob"),
        )
    )


def _bpe_sql_round(prev: str, r: int) -> str:
    """One BPE round as SQL CTE text: count pairs on {prev}, rank the
    top-5 candidates, apply the #1 merge → s{r}."""
    return f"""
    pc{r} AS (
      SELECT pair, CAST(SUM(n) AS BIGINT) AS cnt FROM (
        SELECT unnest([syms[i] || ' ' || syms[i+1] for i in range(1, len(syms))]) AS pair, n
        FROM (SELECT string_split(trim({prev}.seq), ' ') AS syms, n FROM {prev})
        WHERE len(syms) >= 2
      ) GROUP BY pair
    ),
    top{r} AS (
      SELECT {r} AS round, pair, cnt,
             CAST(row_number() OVER (ORDER BY cnt DESC, pair) AS INT) AS rank
      FROM pc{r} ORDER BY cnt DESC, pair LIMIT 5
    ),
    s{r} AS (
      SELECT replace({prev}.seq, ' ' || t.pair || ' ',
                     ' ' || replace(t.pair, ' ', '') || ' ') AS seq, n
      FROM {prev}, (SELECT pair FROM top{r} WHERE rank = 1) t
    )"""


@register(
    "llm_bpe_train_merges",
    oracle=f"""
    WITH wc AS (
      SELECT word, COUNT(*) AS n FROM (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents
      ) WHERE word <> '' GROUP BY word
    ),
    s0 AS (
      SELECT ' ' || array_to_string([word[i:i] for i in range(1, length(word)+1)], ' ')
               || ' ' AS seq, n
      FROM wc
    ),
    {_bpe_sql_round('s0', 1)},
    {_bpe_sql_round('s1', 2)},
    {_bpe_sql_round('s2', 3)}
    SELECT * FROM top1 UNION ALL SELECT * FROM top2 UNION ALL SELECT * FROM top3
    """,
)
def llm_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three unrolled rounds of BPE tokenizer training: count
    corpus-weighted adjacent-symbol pairs over the word-type table,
    adopt the most frequent pair as a merge rule, rewrite the symbol
    sequences, repeat.  Emits each round's top-5 merge candidates
    (rank 1 = the adopted rule) — the actual training loop, not just
    the counting step (``llm_bpe_pair_counts``).

    Merge application is a single leftmost-non-overlapping pass over
    the sentinel-spaced symbol sequence (verified identical scan
    semantics in both engines); adjacent pairs come from the
    zipped-slice shape (HOF lambda touches only its element).  Scale:
    every round is vocabulary-sized (word TYPES with counts, not the
    token stream) — one map-combined aggregate + a 1-row broadcast for
    the adopted rule; real trainers run exactly this loop with the
    merge table, not the corpus, on the driver.
    """
    d = load_table(spark, sf_dir, "documents")
    wc = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    chars = F.filter(F.split(F.col("word"), ""), lambda c: c != F.lit(""))
    seqs = wc.select(
        F.concat(F.lit(" "), F.array_join(chars, " "), F.lit(" ")).alias("seq"), "n"
    )

    def pair_top5(s: DataFrame, rnd: int) -> DataFrame:
        syms = F.split(F.trim(F.col("seq")), " ")
        k = F.greatest(F.size(syms) - 1, F.lit(0))
        zipped = F.slice(
            F.arrays_zip(syms.alias("a"), F.slice(syms, 2, k).alias("b")), 1, k
        )
        pairs = F.transform(zipped, lambda z: F.concat(z.a, F.lit(" "), z.b))
        return (
            s.select(F.explode(pairs).alias("pair"), "n")
            .groupBy("pair")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "pair")
            .limit(5)
            .select(
                F.lit(rnd).alias("round"),
                "pair",
                "cnt",
                F.row_number()
                .over(W.orderBy(F.col("cnt").desc(), "pair"))
                .cast("int")
                .alias("rank"),
            )
        )

    def apply_merge(s: DataFrame, top5: DataFrame) -> DataFrame:
        rule = top5.filter(F.col("rank") == 1).select("pair")
        return s.crossJoin(F.broadcast(rule)).select(
            F.replace(
                F.col("seq"),
                F.concat(F.lit(" "), F.col("pair"), F.lit(" ")),
                F.concat(
                    F.lit(" "), F.replace(F.col("pair"), F.lit(" "), F.lit("")), F.lit(" ")
                ),
            ).alias("seq"),
            "n",
        )

    outs = []
    cur = seqs
    for rnd in (1, 2, 3):
        top5 = pair_top5(cur, rnd)
        outs.append(top5)
        if rnd < 3:
            # cur is read twice per round (pair counts + rewrite):
            # persist the vocab-sized frame so the plan stays linear in
            # rounds instead of replicating the base subtree 2^rounds x
            cur = cached(apply_merge(cur, top5))
    return outs[0].unionAll(outs[1]).unionAll(outs[2])


@register(
    "llm_mixture_temperature",
    oracle="""
    WITH st AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
    tot AS (SELECT SUM(n) AS total FROM st),
    sq AS (
      SELECT lang, CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS p,
             sqrt(CAST(n AS DOUBLE) / CAST(total AS DOUBLE)) AS s
      FROM st, tot
    ),
    nrm AS (
      SELECT list_reduce([CAST(0.0 AS DOUBLE)] || list(s ORDER BY lang),
                         (a, b) -> a + b) AS norm
      FROM sq
    ),
    fr AS (
      SELECT lang, LEAST(CAST(1.0 AS DOUBLE), 0.5 * (s / norm) / p) AS keep_frac
      FROM sq, nrm
    )
    SELECT d.doc_id, d.lang,
           substring(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 4) AS hk
    FROM documents d JOIN fr USING (lang)
    WHERE fr.keep_frac >= 1.0
       OR substring(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 4)
          < lower(lpad(to_hex(CAST(floor(fr.keep_frac * 65536) AS BIGINT)), 4, '0'))
    """,
)
def llm_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted language-mixture sampling (α = 0.5): target
    language share q_l ∝ p_l^α renormalized, realized by keeping each
    document iff its content-hash fraction clears the per-language
    acceptance ratio 0.5·(q_l/p_l) — the multilingual-corpus rebalance
    every LLM data pipeline runs (low-resource languages are upsampled
    RELATIVE to their natural share; the 0.5 budget factor keeps every
    acceptance < 1 so no duplication is needed).

    Parity: p and √p are per-row IEEE ops on identical doubles; the
    5-term normalizer folds in lang-sorted order (index-ordered-fold
    convention — a bare SUM(double) would be shuffle-order-dependent);
    the md5 threshold is the engine's deterministic sampling pattern
    (same sample on any cluster shape, which is what reproducible
    curation needs).  Scale: the language table is tiny (aggregate +
    broadcast back); the corpus pass is a zero-shuffle filter.
    """
    d = load_table(spark, sf_dir, "documents")
    st = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    tot = st.agg(F.sum("n").alias("total"))
    sq = st.crossJoin(F.broadcast(tot)).select(
        "lang",
        (F.col("n").cast("double") / F.col("total").cast("double")).alias("p"),
        F.sqrt(F.col("n").cast("double") / F.col("total").cast("double")).alias("s"),
    )
    nrm = sq.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("lang", "s"))),
            F.lit(0.0),
            lambda acc, x: acc + x["s"],
        ).alias("norm")
    )
    fr = sq.crossJoin(F.broadcast(nrm)).select(
        "lang",
        F.least(
            F.lit(1.0), 0.5 * (F.col("s") / F.col("norm")) / F.col("p")
        ).alias("keep_frac"),
    )
    hk = F.substring(F.md5(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))), 1, 4)
    thr = F.lower(
        F.lpad(F.hex(F.floor(F.col("keep_frac") * 65536).cast("long")), 4, "0")
    )
    return (
        d.join(F.broadcast(fr), "lang")
        .filter((F.col("keep_frac") >= 1.0) | (hk < thr))
        .select("doc_id", "lang", hk.alias("hk"))
    )


_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is"]


@register(
    "llm_quality_classifier",
    oracle=f"""
    WITH f AS (
      SELECT doc_id, lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
             CAST(len(list_filter(string_split(text, ' '),
                  x -> list_contains({_STOPWORDS!r}, x))) AS BIGINT) AS stop_n,
             CAST(len(list_filter(string_split(text, ' '),
                  x -> length(x) > 6)) AS BIGINT) AS long_n,
             CAST(len(regexp_extract_all(text, '[.,!?;]')) AS BIGINT) AS punct_n
      FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, lang, n_words, stop_n, long_n, punct_n,
           2.0 * (CAST(stop_n AS DOUBLE) / n_words)
             + 1.5 * (CAST(long_n AS DOUBLE) / n_words)
             - 3.0 * (CAST(punct_n AS DOUBLE) / n_words) AS score,
           (2.0 * (CAST(stop_n AS DOUBLE) / n_words)
             + 1.5 * (CAST(long_n AS DOUBLE) / n_words)
             - 3.0 * (CAST(punct_n AS DOUBLE) / n_words)) > 0.35 AS keep
    FROM f WHERE n_words > 0
    """,
)
def llm_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style linear quality gate: engineered per-document
    features (stopword / long-word / punctuation ratios) under fixed
    weights, thresholded — the shape of every cheap model-based corpus
    filter, kept entirely expression-level (the learned-weights
    version swaps the literals for a broadcast weight table).

    Per-row integer counts and double ratios only — no cross-row
    float math, so parity is exact by construction; zero shuffles.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    words = F.split(F.col("text"), " ")
    stop_set = F.array(*[F.lit(s) for s in _STOPWORDS])
    f = d.select(
        "doc_id",
        "lang",
        F.size(words).cast("long").alias("n_words"),
        F.size(F.filter(words, lambda x: F.array_contains(stop_set, x)))
        .cast("long")
        .alias("stop_n"),
        F.size(F.filter(words, lambda x: F.length(x) > 6)).cast("long").alias("long_n"),
        F.regexp_count("text", F.lit(r"[.,!?;]")).cast("long").alias("punct_n"),
    ).filter(F.col("n_words") > 0)
    score = (
        2.0 * (F.col("stop_n").cast("double") / F.col("n_words"))
        + 1.5 * (F.col("long_n").cast("double") / F.col("n_words"))
        - 3.0 * (F.col("punct_n").cast("double") / F.col("n_words"))
    )
    return f.select(
        "doc_id",
        "lang",
        "n_words",
        "stop_n",
        "long_n",
        "punct_n",
        score.alias("score"),
        (score > 0.35).alias("keep"),
    )
