"""Corpus hygiene operators — the data-privacy / data-quality /
storage stages of a pre-training pipeline (north-star LLM-ops
surface; the reference ETL has no analogue): PII scrubbing, Gopher
repetition metrics, int8 embedding quantization, language-mix
rebalancing, tokenizer-vocab construction, URL component extraction.

Scale shapes:

* PII scrub and int8 quantization are pure per-row expression
  pipelines — no shuffle at all; they run at parquet-scan speed and
  parallelize embarrassingly at 100 TB.
* Repetition metrics are two map-side-combined hash aggregations
  keyed by ``doc_id`` (word counts, bigram counts) joined back on the
  same key — the join co-partitions with the aggregations, so the
  whole operator is effectively one shuffle of (doc_id, gram) pairs.

Float parity: every ratio here is a quotient of exact integers (or a
per-row IEEE expression), deterministic and bit-identical across
engines — no cross-row double accumulation anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from project_fauna_spark.functions.shingles import word_bigrams
from project_fauna_spark.io import load_table
from project_fauna_spark.plans.registry import register

# RE2-and-Java-compatible patterns (no backrefs, no lookaround) so the
# Spark (java.util.regex) and DuckDB (RE2) sides match the same spans.
_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PHONE = r"\b\d{3}-\d{4}\b"

# The synthetic corpus contains no PII, so each doc gets a
# deterministic PII suffix (same expression on both engines); the
# scrub then has real matches to find and redact.
_ORACLE_PII = """
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@mail.example.com ip 10.0.'
              || CAST(doc_id % 256 AS VARCHAR) || '.7 tel 555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS aug
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(aug, '__EMAIL__')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(regexp_replace(aug, '__EMAIL__', '<EMAIL>', 'g'),
                                   '__IPV4__')) AS BIGINT) AS n_ips,
       CAST(len(regexp_extract_all(
           regexp_replace(regexp_replace(aug, '__EMAIL__', '<EMAIL>', 'g'),
                          '__IPV4__', '<IP>', 'g'),
           '__PHONE__')) AS BIGINT) AS n_phones,
       regexp_replace(
         regexp_replace(
           regexp_replace(aug, '__EMAIL__', '<EMAIL>', 'g'),
           '__IPV4__', '<IP>', 'g'),
         '__PHONE__', '<PHONE>', 'g') AS clean_text
FROM aug
""".replace("__EMAIL__", _EMAIL).replace("__IPV4__", _IPV4).replace("__PHONE__", _PHONE)


@register("llm_pii_scrub", oracle=_ORACLE_PII)
def llm_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex PII redaction (emails → IPs → phones) with match counts.

    Counts are staged the same way as the replacements (each pattern
    counted on the text with the previous patterns already redacted)
    so overlapping spans are attributed to exactly one category.
    """
    d = load_table(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com ip 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 tel 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    x = d.select("doc_id", aug.alias("aug"))
    no_email = F.regexp_replace("aug", _EMAIL, "<EMAIL>")
    no_ip = F.regexp_replace(no_email, _IPV4, "<IP>")
    return x.select(
        "doc_id",
        F.regexp_count("aug", F.lit(_EMAIL)).cast("bigint").alias("n_emails"),
        F.regexp_count(no_email, F.lit(_IPV4)).cast("bigint").alias("n_ips"),
        F.regexp_count(no_ip, F.lit(_PHONE)).cast("bigint").alias("n_phones"),
        F.regexp_replace(no_ip, _PHONE, "<PHONE>").alias("clean_text"),
    )


@register(
    "llm_gopher_repetition",
    oracle="""
    WITH base AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      WHERE len(string_split(text, ' ')) >= 2
    ),
    wg AS (SELECT doc_id, unnest(ws) AS g FROM base),
    wc AS (SELECT doc_id, g, COUNT(*) AS c FROM wg GROUP BY doc_id, g),
    wt AS (SELECT doc_id, MAX(c) AS top_word_n,
                  CAST(SUM(c) AS BIGINT) AS n_words
           FROM wc GROUP BY doc_id),
    bg AS (SELECT doc_id,
                  unnest([array_to_string(ws[i:i+1], ' ')
                          for i in range(1, len(ws))]) AS g
           FROM base),
    bc AS (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY doc_id, g),
    bt AS (SELECT doc_id, MAX(c) AS top_bigram_n FROM bc GROUP BY doc_id)
    SELECT w.doc_id, w.n_words, w.top_word_n, b.top_bigram_n,
           CAST(w.top_word_n AS DOUBLE) / w.n_words AS top_word_frac,
           CAST(b.top_bigram_n AS DOUBLE) / (w.n_words - 1) AS top_bigram_frac,
           (CAST(w.top_word_n AS DOUBLE) / w.n_words > 0.3
            OR CAST(b.top_bigram_n AS DOUBLE) / (w.n_words - 1) > 0.2)
             AS repetitive
    FROM wt w JOIN bt b ON w.doc_id = b.doc_id
    """,
)
def llm_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals: top-word and top-bigram mass.

    A document dominated by one word or one bigram is boilerplate /
    spam; Rae et al. 2021 (Gopher) filter on exactly these fractions.
    Both metrics are count ratios — exact integers until the final
    per-row division, so cross-engine parity is bit-exact.

    Bigrams are built with the zipped-slice shape
    (:func:`project_fauna_spark.functions.shingles._zipped_trigrams`):
    the HOF lambda touches only its own element — no O(len²)
    re-evaluation of ``split`` inside the lambda.
    """
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    base = d.filter(F.size(words) >= 2).select(
        "doc_id", words.alias("ws"), word_bigrams(F.col("text")).alias("bg")
    )

    wt = (
        base.select("doc_id", F.explode("ws").alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_word_n"), F.sum("c").alias("n_words"))
    )
    bt = (
        base.select("doc_id", F.explode("bg").alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bigram_n"))
    )
    top_word_frac = F.col("top_word_n").cast("double") / F.col("n_words")
    top_bigram_frac = F.col("top_bigram_n").cast("double") / (F.col("n_words") - 1)
    return wt.join(bt, "doc_id").select(
        "doc_id",
        "n_words",
        "top_word_n",
        "top_bigram_n",
        top_word_frac.alias("top_word_frac"),
        top_bigram_frac.alias("top_bigram_frac"),
        ((top_word_frac > 0.3) | (top_bigram_frac > 0.2)).alias("repetitive"),
    )


@register(
    "sim_quantize_int8",
    oracle="""
    WITH e AS (
      SELECT vec_id, label,
             [CAST(x AS DOUBLE) for x in embedding] AS demb
      FROM embeddings
    ),
    m AS (
      SELECT vec_id, label, demb,
             list_max([abs(x) for x in demb]) AS scale_max
      FROM e
    )
    SELECT vec_id, label, scale_max,
           array_to_string([CAST(CAST(floor(x * 127.0 / scale_max) AS INTEGER) AS VARCHAR)
                            for x in demb], ',') AS q8
    FROM m
    WHERE scale_max > 0
    """,
)
def sim_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector absmax int8 quantization (the 4× storage/bandwidth
    cut every large ANN index applies before sharding).

    ``q = floor(x · 127 / absmax)`` in double — per-row IEEE ops, so
    both engines produce identical arrays.  The scalar ``scale_max``
    is zipped in via ``array_repeat`` rather than referenced inside
    the lambda: an outer expression inside a HOF lambda re-evaluates
    per element (the O(d²) trap), while the repeat evaluates it once
    per row.  Zero vectors are excluded (no defined scale).
    """
    e = load_table(spark, sf_dir, "embeddings")
    demb = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    with_scale = e.select(
        "vec_id",
        "label",
        demb.alias("demb"),
    ).select(
        "vec_id",
        "label",
        "demb",
        F.array_max(F.transform(F.col("demb"), F.abs)).alias("scale_max"),
    )
    return with_scale.filter(F.col("scale_max") > 0).select(
        "vec_id",
        "label",
        "scale_max",
        F.array_join(
            F.zip_with(
                F.col("demb"),
                F.array_repeat(F.col("scale_max"), F.size(F.col("demb"))),
                lambda x, s: F.floor(x * F.lit(127.0) / s).cast("int").cast("string"),
            ),
            ",",
        ).alias("q8"),
    )


@register(
    "llm_balance_lang_mix",
    oracle="""
    WITH c AS (SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang),
    t AS (SELECT MIN(cnt) AS target FROM c),
    r AS (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS mix_rank
      FROM documents
    )
    SELECT r.doc_id, r.lang, r.mix_rank
    FROM r, t
    WHERE r.mix_rank <= t.target
    """,
)
def llm_balance_lang_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-mix rebalancing: cap every language at the smallest
    language's document count, selecting survivors by deterministic
    md5 rank (a seeded-shuffle-without-an-RNG — same subset on any
    cluster size, any partitioning, any engine).

    The target is computed as a 1-row aggregate and cross-joined
    (Catalyst broadcasts it); no ``.collect()`` round-trip.  The
    per-language rank window funnels a language through one task —
    at 100 TB, decompose it over (lang, doc_id div B) buckets with a
    broadcast offset table exactly as ``llm_pack_shards`` does; the
    md5-ordered rank makes the bucketed spelling value-identical.
    """
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt"))
    target = counts.agg(F.min("cnt").alias("target"))
    rank = F.row_number().over(
        W.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    )
    ranked = d.select("doc_id", "lang", rank.cast("bigint").alias("mix_rank"))
    return ranked.crossJoin(F.broadcast(target)).filter(
        F.col("mix_rank") <= F.col("target")
    ).select("doc_id", "lang", "mix_rank")


@register(
    "llm_vocab_topk",
    oracle="""
    WITH base AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      WHERE len(string_split(text, ' ')) >= 2
    ),
    uni AS (
      SELECT unnest(ws) AS token, 'uni' AS kind FROM base
    ),
    bi AS (
      SELECT unnest([array_to_string(ws[i:i+1], ' ')
                     for i in range(1, len(ws))]) AS token,
             'bi' AS kind
      FROM base
    ),
    counts AS (
      SELECT token, kind, COUNT(*) AS n
      FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)
      GROUP BY token, kind
    ),
    top AS (
      SELECT token, kind, n
      FROM counts ORDER BY n DESC, token LIMIT 1000
    )
    SELECT CAST(row_number() OVER (ORDER BY n DESC, token) AS BIGINT) AS token_id,
           token, kind, n
    FROM top
    """,
)
def llm_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary construction: top-1000 unigrams+bigrams by
    corpus frequency, with dense ids assigned in (count desc, token)
    order — the count-and-rank core of WordPiece/BPE vocab building.

    The count is one map-combined hash aggregate over the exploded
    gram stream; the top-K is ``TakeOrderedAndProject`` (no global
    sort), and the id-assigning window runs on K rows only — bounded
    regardless of corpus size.  Ties are broken by token text, so the
    vocab is deterministic across engines and cluster layouts.
    """
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    base = d.filter(F.size(words) >= 2)
    uni = base.select(F.explode(words).alias("token"), F.lit("uni").alias("kind"))
    bi = base.select(
        F.explode(word_bigrams(F.col("text"))).alias("token"),
        F.lit("bi").alias("kind"),
    )
    counts = (
        uni.unionAll(bi)
        .groupBy("token", "kind")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = counts.orderBy(F.col("n").desc(), "token").limit(1000)
    rank = F.row_number().over(W.orderBy(F.col("n").desc(), "token"))
    return top.select(
        rank.cast("bigint").alias("token_id"), "token", "kind", "n"
    )


@register(
    "scalar_url_fns",
    oracle="""
    SELECT doc_id,
           'host' || CAST(doc_id % 7 AS VARCHAR) || '.example.com' AS host,
           '/' || lang || '/doc/' || CAST(doc_id AS VARCHAR) AS path,
           'ref=r' || CAST(doc_id % 3 AS VARCHAR) AS query,
           'r' || CAST(doc_id % 3 AS VARCHAR) AS ref_param,
           'https' AS protocol
    FROM documents
    """,
)
def scalar_url_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL component extraction (``parse_url``): host / path / query /
    single parameter / protocol from deterministically constructed
    URLs — the oracle reconstructs each component from the same parts,
    so the check certifies Spark's parser against ground truth.
    """
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://host"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".example.com/"),
        F.col("lang"),
        F.lit("/doc/"),
        F.col("doc_id").cast("string"),
        F.lit("?ref=r"),
        (F.col("doc_id") % 3).cast("string"),
    )
    x = d.select("doc_id", url.alias("url"))
    return x.select(
        "doc_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("ref")).alias("ref_param"),
        F.parse_url("url", F.lit("PROTOCOL")).alias("protocol"),
    )


@register(
    "llm_blocklist_filter",
    oracle="""
    SELECT doc_id,
           coalesce(array_to_string(
             list_sort(list_intersect(list_distinct(string_split(text, ' ')),
                                      ['slow', 'crash', 'spark'])), '|'),
             '') AS matched_terms,
           len(list_intersect(list_distinct(string_split(text, ' ')),
                              ['slow', 'crash', 'spark'])) > 0 AS flagged
    FROM documents
    """,
)
def llm_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist screening: exact-term membership against a curated
    list, with the matched terms surfaced for audit — the first
    safety gate of a corpus pipeline (regex/classifier gates follow
    the same per-row shape).

    Pure array expressions per row, no shuffle; at 100 TB a large
    blocklist broadcasts and the intersect becomes a hash probe.
    """
    d = load_table(spark, sf_dir, "documents")
    blocklist = F.array(F.lit("slow"), F.lit("crash"), F.lit("spark"))
    words = F.array_distinct(F.split(F.col("text"), " "))
    matched = F.array_sort(F.array_intersect(words, blocklist))
    return d.select(
        "doc_id",
        F.array_join(matched, "|").alias("matched_terms"),
        (F.size(matched) > 0).alias("flagged"),
    )


@register(
    "llm_dataset_manifest",
    oracle="""
    WITH g AS (
      SELECT lang, source,
             COUNT(*) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
             CAST(SUM(n_chars) AS BIGINT) AS n_chars
      FROM documents GROUP BY lang, source
    )
    SELECT lang, source, n_docs, n_tokens, n_chars,
           CAST(n_tokens AS DOUBLE)
             / CAST(SUM(n_tokens) OVER () AS DOUBLE) AS token_share
    FROM g
    """,
)
def llm_dataset_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card manifest: per (lang, source) document / token /
    byte counts with each cell's share of total tokens — the datasheet
    every training-data release ships.

    One map-combined aggregate over the corpus; the share window runs
    on the (lang × source) grid, bounded by catalog size.  All counts
    exact; the share is a per-row ratio of exact integers.
    """
    d = load_table(spark, sf_dir, "documents")
    g = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).alias("n_tokens"),
        F.sum("n_chars").alias("n_chars"),
    )
    total = F.sum("n_tokens").over(W.partitionBy())
    return g.select(
        "lang",
        "source",
        "n_docs",
        "n_tokens",
        "n_chars",
        (F.col("n_tokens").cast("double") / total.cast("double")).alias("token_share"),
    )
