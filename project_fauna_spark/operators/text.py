"""Text-analysis operators over the ``documents`` table.

North-star surface (SURVEY.md §2b): token statistics, quality scoring,
language-ID heuristic, document fingerprinting, n-gram frequency,
exact TF-IDF, and a hashing-trick TF vector.  The reference's only
text op is a CSV split (utils.py:14-18) — everything here is new
surface, built from Catalyst expressions (explode + groupBy + higher-
order array functions); no Python UDFs anywhere.

Scale design (100 TB):

* Everything is explode → hash-aggregate: one shuffle keyed by
  (doc, term) or term; partial aggregation map-side.  No collects, no
  cross joins.
* The global n-gram top-k ends in TakeOrderedAndProject (per-partition
  k then merge) — the only "global" structure is k rows.
* Fingerprints are per-row folds (no shuffle at all).
* TF-IDF's document-frequency table is term-keyed — the classic skew
  point; AQE skew handling plus the integer-ranked top-k per doc keep
  the plan stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W, functions as F

from project_fauna_spark.functions.shingles import word_bigrams
from project_fauna_spark.io import load_table
from project_fauna_spark.plans.registry import register

STOPWORDS = ["the", "a", "of", "and", "in"]
_SQL_STOP = "['" + "', '".join(STOPWORDS) + "']"

LANGS = ["en", "de", "es", "fr", "zh"]
_SQL_LANGS = "['" + "', '".join(LANGS) + "']"

from project_fauna_spark.functions.wordhash import (  # noqa: E402
    SQL_WORD_HASHES,
    WORDHASH_MOD,
    word_hashes,
)

MOD_P = WORDHASH_MOD  # word-level fold (base 33) shares the modulus


@register(
    "text_token_stats",
    oracle=f"""
    WITH w AS (SELECT doc_id, lang, n_chars, string_split(text, ' ') AS words FROM documents)
    SELECT doc_id, lang, n_chars,
           len(words) AS n_tokens,
           len(list_distinct(words)) AS n_distinct,
           CAST(len(list_distinct(words)) AS DOUBLE) / len(words) AS distinct_ratio,
           CAST(length(array_to_string(words, '')) AS DOUBLE) / len(words) AS avg_word_len,
           len(list_filter(words, x -> list_contains({_SQL_STOP}, x))) AS n_stopwords
    FROM w
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting + distinct/stopword/length statistics."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    n = F.size(words)
    return d.select(
        "doc_id",
        "lang",
        "n_chars",
        n.cast("long").alias("n_tokens"),
        F.size(F.array_distinct(words)).cast("long").alias("n_distinct"),
        (F.size(F.array_distinct(words)).cast("double") / n).alias("distinct_ratio"),
        (F.length(F.array_join(words, "")).cast("double") / n).alias("avg_word_len"),
        F.size(F.filter(words, lambda x: F.array_contains(stop, x))).cast("long").alias("n_stopwords"),
    )


@register(
    "text_quality_score",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
             CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               / len(string_split(text, ' ')) AS uniq_ratio,
             CAST(len(list_filter(string_split(text, ' '),
                                  x -> list_contains({_SQL_STOP}, x))) AS DOUBLE)
               / len(string_split(text, ' ')) AS stop_ratio
      FROM documents
    )
    SELECT doc_id, n_tokens, uniq_ratio, stop_ratio,
           0.4 * least(1.0, n_tokens / 200.0)
             + 0.3 * uniq_ratio
             + 0.3 * (1.0 - stop_ratio) AS quality,
           (n_tokens >= 50 AND uniq_ratio >= 0.1) AS keep
    FROM s
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score (length, lexical diversity, stopword
    load) + a keep/drop gate — the standard pre-training filter shape."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    n = F.size(words)
    uniq = F.size(F.array_distinct(words)).cast("double") / n
    stop_ratio = F.size(F.filter(words, lambda x: F.array_contains(stop, x))).cast("double") / n
    quality = (
        F.lit(0.4) * F.least(F.lit(1.0), n / F.lit(200.0))
        + F.lit(0.3) * uniq
        + F.lit(0.3) * (F.lit(1.0) - stop_ratio)
    )
    return d.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        uniq.alias("uniq_ratio"),
        stop_ratio.alias("stop_ratio"),
        quality.alias("quality"),
        ((n >= 50) & (uniq >= 0.1)).alias("keep"),
    )


@register(
    "text_langid_ngram",
    oracle=f"""
    WITH votes AS (
      SELECT doc_id, {_SQL_LANGS}[(ascii(substr(word, 1, 1)) % 5) + 1] AS vote
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
    ),
    tallied AS (
      SELECT doc_id, vote, COUNT(*) AS n,
             row_number() OVER (PARTITION BY doc_id ORDER BY COUNT(*) DESC, vote) AS rn
      FROM votes GROUP BY doc_id, vote
    )
    SELECT t.doc_id, t.vote AS guessed_lang, t.n AS vote_count,
           d.lang AS actual_lang, (t.vote = d.lang) AS agree
    FROM tallied t JOIN documents d ON t.doc_id = d.doc_id
    WHERE t.rn = 1
    """,
)
def text_langid_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-heuristic language ID: each word votes a language by
    its first character's class; majority wins (tiebreak by language).

    The mechanics are the real thing (per-token vote → majority);
    the character→language profile here is a stand-in deterministic
    mapping, since the corpus is synthetic.
    """
    d = load_table(spark, sf_dir, "documents")
    langs = F.array(*[F.lit(x) for x in LANGS])
    votes = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("word")
    ).select(
        "doc_id",
        F.element_at(langs, (F.ascii(F.substring("word", 1, 1)) % 5 + 1).cast("int")).alias("vote"),
    )
    tallied = votes.groupBy("doc_id", "vote").agg(F.count("*").alias("n"))
    w = W.partitionBy("doc_id").orderBy(F.col("n").desc(), "vote")
    top = tallied.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return top.join(d.select("doc_id", "lang"), "doc_id").select(
        "doc_id",
        F.col("vote").alias("guessed_lang"),
        F.col("n").alias("vote_count"),
        F.col("lang").alias("actual_lang"),
        (F.col("vote") == F.col("lang")).alias("agree"),
    )


@register(
    "text_fingerprint",
    oracle=f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
    h AS (
      SELECT doc_id,
             {SQL_WORD_HASHES} AS whashes
      FROM w
    )
    SELECT doc_id,
           list_reduce(list_prepend(CAST(0 AS BIGINT), whashes),
                       (acc, v) -> (acc * 33 + v) % {MOD_P}) AS fingerprint,
           len(whashes) AS n_words
    FROM h
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling polynomial document fingerprint, exact integer math.

    Two nested folds: char-level (base 31) per word, word-level
    (base 33) per document, both mod 1e9+7 — order-sensitive by design
    (reordered words change the fingerprint, unlike a bag-of-words
    hash).  Pure per-row expression work: zero shuffles.
    """
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    whash = word_hashes(words)  # shared base-31 fold (functions/wordhash)
    fingerprint = F.aggregate(
        whash, F.lit(0).cast("long"), lambda acc, v: (acc * 33 + v) % MOD_P
    )
    return d.select(
        "doc_id",
        fingerprint.alias("fingerprint"),
        F.size(words).cast("long").alias("n_words"),
    )


@register(
    "text_ngram_freq",
    oracle="""
    WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
    grams AS (
      SELECT unnest([array_to_string(ws[i:i+1], ' ') for i in range(1, len(ws))]) AS gram
      FROM w
    )
    SELECT gram, COUNT(*) AS n
    FROM grams GROUP BY gram
    ORDER BY n DESC, gram LIMIT 20
    """,
)
def text_ngram_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 word bigrams (explode → count → top-k)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(word_bigrams(F.col("text"))).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "gram")
        .limit(20)
    )


@register(
    "text_tfidf_topk",
    oracle="""
    WITH tokens AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tokens GROUP BY doc_id, term),
    df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tokens GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df,
             row_number() OVER (PARTITION BY tf.doc_id
                                ORDER BY tf.tf DESC, df.df ASC, tf.term) AS rn
      FROM tf JOIN df ON tf.term = df.term
    )
    SELECT doc_id, term, tf, df,
           round(tf * ln((SELECT n_docs FROM n) / (1.0 + df)), 6) AS tfidf_r6
    FROM scored WHERE rn <= 5
    """,
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact TF-IDF, top-5 terms per doc by integer-deterministic rank.

    tf and df are exact counts; ranking uses only integers + the term
    string (never the float score), so the result set is reproducible
    across engines even where ``ln`` differs in the last ulp — the
    float score is emitted rounded to 6 dp for reporting.
    """
    d = load_table(spark, sf_dir, "documents")
    tokens = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("term"))
    tf = tokens.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tokens.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = d.count()  # scalar dimension; at scale: a 1-row broadcast join instead
    w = W.partitionBy("doc_id").orderBy(F.col("tf").desc(), F.col("df").asc(), "term")
    scored = tf.join(df, "term").withColumn("rn", F.row_number().over(w))
    return scored.filter(F.col("rn") <= 5).select(
        "doc_id",
        "term",
        "tf",
        "df",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / (F.lit(1.0) + F.col("df"))), 6).alias(
            "tfidf_r6"
        ),
    )



@register(
    "text_hashed_tf",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           TRUE AS mass_preserved,
           TRUE AS buckets_bounded
    FROM documents
    """,
)
def text_hashed_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick term frequencies: 256 xxhash64 buckets per doc.

    Moved home from window_regrade.py after its round-6 green re-grade
    (CORRECTNESS_r06.json).  The fixed-width feature map used before
    IDF/minhash stages when the vocabulary is unbounded; xxhash64 keeps
    it JVM-side and deterministic.

    Graded edge (bound-style): bucket assignments are xxhash64-based
    (not SQL-portable), so the edge carries the EXACT token count per
    doc (DuckDB recomputes it from the text) plus two honestly-computed
    invariants the oracle emits as literal TRUE: the bucket counts sum
    back to the token count (the hashing trick preserves L1 mass), and
    the number of occupied buckets never exceeds
    min(256, distinct terms).  A bucketing regression flips a boolean
    or shifts a count and hash-fails.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.split(F.col("text"), " ").alias("terms"),
    )
    tokens = toks.select("doc_id", F.explode("terms").alias("term"))
    bucketed = tokens.select(
        "doc_id", F.pmod(F.xxhash64("term"), F.lit(256)).alias("bucket")
    )
    counts = bucketed.groupBy("doc_id", "bucket").agg(F.count("*").alias("n"))
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("n").alias("bucket_mass"),
        F.count("*").alias("n_buckets"),
    )
    return (
        toks.select(
            "doc_id",
            F.size("terms").cast("long").alias("n_tokens"),
            F.least(F.lit(256), F.size(F.array_distinct("terms")))
            .cast("long")
            .alias("max_buckets"),
        )
        .join(per_doc, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("bucket_mass") == F.col("n_tokens")).alias("mass_preserved"),
            (F.col("n_buckets") <= F.col("max_buckets")).alias("buckets_bounded"),
        )
    )



@register(
    "text_fuzzy_match_levenshtein",
    oracle="""
    WITH k AS (
      SELECT doc_id, lang, substring(text, 1, 40) AS prefix,
             string_split(text, ' ')[1] AS first_word
      FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.lang,
           CAST(levenshtein(a.prefix, b.prefix) AS INT) AS dist
    FROM k a JOIN k b
      ON a.lang = b.lang AND a.first_word = b.first_word
     AND a.doc_id < b.doc_id
    WHERE levenshtein(a.prefix, b.prefix) <= 10
    """,
)
def text_fuzzy_match_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy record matching: edit distance ≤ 10 over 40-char prefixes,
    blocked on (lang, first word).

    The blocking key keeps the candidate join EQUI (never all-pairs)
    and the fixed-length prefix bounds the O(len²) Levenshtein cost
    per pair — the standard entity-resolution recipe.  Both engines
    define Levenshtein identically (unit insert/delete/substitute),
    so the distance is integer-exact.
    """
    d = load_table(spark, sf_dir, "documents")
    k = d.select(
        "doc_id",
        "lang",
        F.substring("text", 1, 40).alias("prefix"),
        F.split("text", " ")[0].alias("first_word"),
    )
    a = k.select(
        F.col("doc_id").alias("doc_a"), "lang", "first_word", F.col("prefix").alias("pa")
    )
    b = k.select(
        F.col("doc_id").alias("doc_b"),
        F.col("lang").alias("lang_b"),
        F.col("first_word").alias("fw_b"),
        F.col("prefix").alias("pb"),
    )
    return (
        a.join(
            b,
            (F.col("lang") == F.col("lang_b"))
            & (F.col("first_word") == F.col("fw_b"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .select("doc_a", "doc_b", "lang", F.levenshtein("pa", "pb").alias("dist"))
        .filter(F.col("dist") <= 10)
    )


@register(
    "text_bigram_cond_prob",
    oracle="""
    WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
    pairs AS (
      SELECT unnest([{'w1': ws[i], 'w2': ws[i+1]} for i in range(1, len(ws))]) AS pr
      FROM w
    ),
    big AS (
      SELECT pr.w1 AS w1, pr.w2 AS w2, COUNT(*) AS n12
      FROM pairs GROUP BY 1, 2
    ),
    uni AS (SELECT w1, CAST(SUM(n12) AS BIGINT) AS n1 FROM big GROUP BY w1)
    SELECT b.w1, b.w2, b.n12, u.n1,
           CAST(b.n12 AS DOUBLE) / u.n1 AS cond_prob
    FROM big b JOIN uni u ON b.w1 = u.w1
    WHERE b.n12 >= 10
    """,
)
def text_bigram_cond_prob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram conditional probabilities P(w2 | w1) — the count-based
    language-model primitive (perplexity/surprisal scoring reduces to
    joins against this table).

    Moved home from window_regrade.py after its round-4 green re-grade
    (the r3 red was an uncast DuckDB SUM(BIGINT) -> HUGEINT edge).

    Counts stay integers end-to-end; each probability is ONE double
    division of two exact counts — bit-identical across engines (the
    reason this avoids log-space, where libm ulp differences between
    JVM and C would break value parity).  The unigram table derives
    from the bigram aggregate (continuation counts), so the corpus is
    scanned once."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    k = F.greatest(F.size(words) - 1, F.lit(0))
    zipped = F.slice(
        F.arrays_zip(words.alias("w1"), F.slice(words, 2, k).alias("w2")), 1, k
    )
    big = (
        d.select(F.explode(zipped).alias("pr"))
        .select(F.col("pr.w1").alias("w1"), F.col("pr.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("n12"))
    )
    uni = big.groupBy(F.col("w1").alias("u_w1")).agg(F.sum("n12").alias("n1"))
    return (
        big.join(uni, big.w1 == F.col("u_w1"))
        .filter(F.col("n12") >= 10)
        .select(
            "w1",
            "w2",
            "n12",
            "n1",
            (F.col("n12").cast("double") / F.col("n1")).alias("cond_prob"),
        )
    )
