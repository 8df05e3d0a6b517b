"""Round-3 widening batch: format coverage, audits, temporal joins.

* ``ingest_orc_roundtrip`` — ORC write→read round-trip (the third
  columnar/text format next to parquet scans and the CSV/JSON/XML
  round-trips in ``operators/ingest``).
* ``dq_benford_first_digit`` — Benford's-law first-digit audit of the
  order amounts: the classic fraud/quality screen over a money column.
* ``llm_oov_rate`` — out-of-vocabulary rate per document against the
  corpus top-50 vocabulary: the tokenizer-coverage audit run before
  committing a vocab.
* ``join_temporal_scd2`` — temporal dimension join: builds SCD2-style
  tier intervals from each user's purchase history and joins every
  view event to the tier that was active at view time.
* ``text_doc_keywords`` — per-document top-3 keyword extraction by a
  tf·(N/df) relevance score (log-free tf-idf: libm ``log`` is not
  cross-engine bit-stable, and the monotone N/df transform ranks
  identically).

Float-parity per ``plans/registry``: integer counts, per-row IEEE
double arithmetic only at compared edges, unique window tie-breaks,
and Benford's constants emitted once from Python as VARCHAR-routed
literals so both engines parse the identical double.
"""

from __future__ import annotations

import math
import os
import tempfile

from pyspark.sql import Column, DataFrame, SparkSession, Window as W, functions as F

from project_fauna_spark.cache import cached
from project_fauna_spark.io import load_table
from project_fauna_spark.operators._oracle_shared import SQL_TS_FMT_US, TS_FMT_US
from project_fauna_spark.functions.shingles import (
    GRAM_K as _GRAM_K,
    token_grams as _token_grams,
)
from project_fauna_spark.plans.registry import register


def _roundtrip_dir(sf_dir: str, tag: str) -> str:
    key = sf_dir.strip("/").replace("/", "_")
    return os.path.join(tempfile.gettempdir(), f"fauna_ingest_{tag}_{key}")


@register(
    "ingest_orc_roundtrip",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer WHERE c_custkey < 500
    """,
)
def ingest_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer slice → ORC on disk → self-describing columnar read.

    ORC carries its schema and encodes doubles losslessly, so the
    round-trip is bit-exact; covers the ORC source/sink pair of the
    scan surface (parquet, CSV, JSON, XML, ORC).
    """
    out = _roundtrip_dir(sf_dir, "orc")
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 500)
    c.select("c_custkey", "c_name", "c_acctbal").coalesce(1).write.mode(
        "overwrite"
    ).orc(out)
    return spark.read.orc(out)


def _benford_sql_values() -> str:
    rows = []
    for d in range(1, 10):
        share = math.log10(1.0 + 1.0 / d)
        rows.append(f"({d}, CAST('{share!r}' AS DOUBLE))")
    return ", ".join(rows)


@register(
    "dq_benford_first_digit",
    oracle=f"""
    WITH b(digit, expected) AS (VALUES {_benford_sql_values()}),
    d AS (
      SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                  AS BIGINT) AS digit
      FROM orders WHERE o_totalprice >= 1.0
    ),
    g AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
    t AS (SELECT COUNT(*) AS total FROM d)
    SELECT b.digit, COALESCE(g.n, 0) AS n,
           CAST(COALESCE(g.n, 0) AS DOUBLE) / t.total AS share,
           b.expected,
           abs(CAST(COALESCE(g.n, 0) AS DOUBLE) / t.total - b.expected) AS abs_dev
    FROM b LEFT JOIN g USING (digit) CROSS JOIN t
    """,
)
def dq_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit: observed first-significant-digit shares of
    the order amounts vs the log10(1+1/d) expectation, with absolute
    deviation per digit — the standard screen for fabricated or
    truncated money columns.

    One map-combined 9-row aggregate plus two broadcasts (the digit
    grid and the scalar total).  The Benford constants are computed
    once in Python and emitted as identical literals to both engines
    (libm ``log10`` at query time would not be bit-stable); shares are
    single per-row double divisions.
    """
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1.0)
    d = o.select(
        F.substring(F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1)
        .cast("bigint")
        .alias("digit")
    )
    g = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    t = d.agg(F.count(F.lit(1)).alias("total"))
    b = spark.createDataFrame(
        [(dd, math.log10(1.0 + 1.0 / dd)) for dd in range(1, 10)],
        "digit bigint, expected double",
    )
    share = F.coalesce(F.col("n"), F.lit(0)).cast("double") / F.col("total")
    return (
        b.join(g, "digit", "left")
        .crossJoin(F.broadcast(t))
        .select(
            "digit",
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
            share.alias("share"),
            "expected",
            F.abs(share - F.col("expected")).alias("abs_dev"),
        )
    )


_VOCAB_K = 50


@register(
    "llm_oov_rate",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    w2 AS (SELECT * FROM w WHERE word <> ''),
    wc AS (SELECT word, COUNT(*) AS cnt FROM w2 GROUP BY word),
    vocab AS (
      SELECT word FROM wc ORDER BY cnt DESC, word LIMIT {_VOCAB_K}
    )
    SELECT w2.doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           CAST(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
             AS oov_rate
    FROM w2 LEFT JOIN vocab v USING (word)
    GROUP BY w2.doc_id
    """,
)
def llm_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-coverage audit: build the corpus top-50 vocabulary
    (count-ranked, word tie-break) and report each document's token
    count, out-of-vocabulary token count, and OOV rate — the check run
    before freezing a vocab (``llm_vocab_topk``) for training.

    The vocabulary is a TakeOrdered over the vocabulary-bounded count
    table and is broadcast to the corpus-linear membership probe — at
    100 TB the corpus never shuffles for this, only the word-count
    aggregate does (map-combined).
    """
    d = load_table(spark, sf_dir, "documents")
    w = d.select("doc_id", F.explode(F.split("text", " ")).alias("word")).filter(
        F.col("word") != ""
    )
    wc = w.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    vocab = wc.orderBy(F.col("cnt").desc(), "word").limit(_VOCAB_K).select(
        "word", F.lit(1).alias("in_vocab")
    )
    return (
        w.join(F.broadcast(vocab), "word", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
        )
        .withColumn(
            "oov_rate", F.col("n_oov").cast("double") / F.col("n_tokens")
        )
    )


@register(
    "join_temporal_scd2",
    oracle=f"""
    WITH p AS (
      SELECT user_id, ts,
             CASE WHEN value >= 50.0 THEN 'high' ELSE 'low' END AS tier,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
      FROM events WHERE event_type = 'purchase'
    )
    SELECT v.event_id, v.user_id,
           strftime(v.ts, '{SQL_TS_FMT_US}') AS view_ts,
           p.tier,
           strftime(p.ts, '{SQL_TS_FMT_US}') AS tier_since
    FROM events v JOIN p
      ON v.user_id = p.user_id
     AND v.ts >= p.ts
     AND (p.valid_to IS NULL OR v.ts < p.valid_to)
    WHERE v.event_type = 'view'
    """,
)
def join_temporal_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal dimension join: each user's purchase history becomes an
    SCD2-style interval table (tier = high/low by purchase value,
    effective from that purchase until the next), and every view event
    joins to the tier active at view time — the warehouse pattern for
    joining facts to slowly-changing dimensions *as of* the fact's
    timestamp.

    One window pass builds the intervals (purchase-sized), then an
    equi join on user_id carries the interval predicate — the shuffle
    is keyed on the real key, the non-equi part only filters within
    the matched key group.  Timestamps are formatted at the compared
    edge (µs precision) per the as-of convention.
    """
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("p_ts", "event_id")
    p = (
        e.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "event_id",
            F.col("ts").alias("p_ts"),
            F.when(F.col("value") >= 50.0, "high").otherwise("low").alias("tier"),
        )
        .withColumn("valid_to", F.lead("p_ts").over(w))
        .drop("event_id")
    )
    v = e.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", F.col("ts").alias("v_ts")
    )
    j = v.join(
        p,
        (v.user_id == p.user_id)
        & (F.col("v_ts") >= F.col("p_ts"))
        & (F.col("valid_to").isNull() | (F.col("v_ts") < F.col("valid_to"))),
    )
    return j.select(
        "event_id",
        v.user_id.alias("user_id"),
        F.date_format("v_ts", TS_FMT_US).alias("view_ts"),
        "tier",
        F.date_format("p_ts", TS_FMT_US).alias("tier_since"),
    )


@register(
    "text_doc_keywords",
    oracle="""
    WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    w2 AS (SELECT * FROM w WHERE word <> ''),
    tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM w2 GROUP BY doc_id, word),
    df AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY word),
    t AS (SELECT COUNT(*) AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.word, tf.tf,
             tf.tf * (CAST(t.n AS DOUBLE) / df.df) AS score
      FROM tf JOIN df USING (word) CROSS JOIN t
    )
    SELECT doc_id, word, tf, score, CAST(rk AS BIGINT) AS rk FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, word) AS rk
      FROM scored
    ) WHERE rk <= 3
    """,
)
def text_doc_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: top-3 words by the log-free
    tf-idf score tf·(N/df) (same ranking as tf·log(N/df) for df ≤ N;
    libm ``log`` is not cross-engine bit-stable).

    tf and df are map-combined aggregates (df over the already-reduced
    (doc, word) table, not the corpus); N broadcasts as a scalar; the
    per-document top-3 is a WindowGroupLimit — each group prunes to 3
    rows before the final shuffle.
    """
    d = load_table(spark, sf_dir, "documents")
    w = d.select("doc_id", F.explode(F.split("text", " ")).alias("word")).filter(
        F.col("word") != ""
    )
    tf = w.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    t = d.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.join(df_, "word")
        .crossJoin(F.broadcast(t))
        .select(
            "doc_id",
            "word",
            "tf",
            (F.col("tf") * (F.col("n").cast("double") / F.col("df"))).alias("score"),
        )
    )
    wk = W.partitionBy("doc_id").orderBy(F.col("score").desc(), "word")
    return (
        scored.withColumn("rk", F.row_number().over(wk).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "word", "tf", "score", "rk")
    )


@register(
    "llm_sample_temperature_mix",
    oracle="""
    WITH w AS (
      SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    lt AS (
      SELECT lang, COUNT(*) AS n_tokens FROM w WHERE word <> '' GROUP BY lang
    ),
    ld AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
    t AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total FROM lt),
    s AS (
      SELECT ld.lang, ld.n_docs, lt.n_tokens,
             CAST(lt.n_tokens AS DOUBLE) / t.total AS share,
             sqrt(CAST(lt.n_tokens AS DOUBLE) / t.total) AS w_raw
      FROM ld JOIN lt USING (lang) CROSS JOIN t
    ),
    z AS (
      SELECT CAST(CAST(SUM(CAST(CAST(w_raw AS VARCHAR) AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS zsum
      FROM s
    )
    SELECT s.lang, s.n_docs, s.n_tokens, s.share,
           s.w_raw / z.zsum AS weight,
           (s.w_raw / z.zsum) * t.total AS expected_tokens
    FROM s CROSS JOIN z CROSS JOIN t
    """,
)
def llm_sample_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax/mT5-style temperature-sampled language mixing at T=2:
    per-language token shares are re-weighted by share^(1/T) = √share
    and renormalized, boosting tail languages — the standard recipe for
    balancing multilingual pretraining corpora.

    T=2 is deliberate: ``sqrt`` is IEEE-correctly-rounded on both
    engines, whereas general ``pow`` is libm-dependent and would break
    bit parity.  The √share sum is decimal-accumulated over the tiny
    per-language table (the only cross-row double sum); every other
    edge is a per-row division or multiply.  Everything after the one
    map-combined token count is keyspace-sized.
    """
    d = load_table(spark, sf_dir, "documents")
    w = d.select("lang", F.explode(F.split("text", " ")).alias("word")).filter(
        F.col("word") != ""
    )
    lt = w.groupBy("lang").agg(F.count(F.lit(1)).alias("n_tokens"))
    ld = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    t = lt.agg(F.sum("n_tokens").alias("total"))
    s = (
        ld.join(lt, "lang")
        .crossJoin(F.broadcast(t))
        .withColumn("share", F.col("n_tokens").cast("double") / F.col("total"))
        .withColumn("w_raw", F.sqrt(F.col("share")))
    )
    z = s.agg(
        F.sum(F.col("w_raw").cast("decimal(30,8)")).cast("double").alias("zsum")
    )
    return (
        s.crossJoin(F.broadcast(z))
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            "share",
            (F.col("w_raw") / F.col("zsum")).alias("weight"),
            ((F.col("w_raw") / F.col("zsum")) * F.col("total")).alias(
                "expected_tokens"
            ),
        )
    )


@register(
    "window_percent_of_total",
    oracle="""
    WITH rev AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             SUM(CAST(CAST(l.l_extendedprice * (1 - l.l_discount) AS VARCHAR) AS DECIMAL(30,8)))
               AS dec_rev
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY r.r_name, n.n_name
    )
    SELECT region, nation,
           CAST(CAST(dec_rev AS VARCHAR) AS DOUBLE) AS revenue,
           CAST(CAST(dec_rev AS VARCHAR) AS DOUBLE)
             / CAST(CAST(SUM(dec_rev) OVER (PARTITION BY region) AS VARCHAR) AS DOUBLE)
             AS region_share
    FROM rev
    """,
)
def window_percent_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each nation's revenue as a share of its
    region's total — the percent-of-total window pattern over the
    supplier→nation→region rollup.

    The revenue aggregate is decimal-exact; the region total is a
    decimal window sum over the 25-row nation aggregate (keyspace-
    sized — a window here is NOT the RFM scale trap); both cast to
    double only at the final division.  Bounded dims (nation/region)
    broadcast into the
    lineitem scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region")
    rev = (
        li.join(su, li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(30,8)"
                )
            ).alias("dec_rev")
        )
    )
    w = W.partitionBy("region")
    return rev.select(
        "region",
        "nation",
        F.col("dec_rev").cast("double").alias("revenue"),
        (
            F.col("dec_rev").cast("double")
            / F.sum("dec_rev").over(w).cast("double")
        ).alias("region_share"),
    )


@register(
    "q_market_basket_lift",
    oracle="""
    WITH ib AS (
      SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    nb AS (SELECT brand, COUNT(*) AS n FROM ib GROUP BY brand),
    t AS (SELECT COUNT(DISTINCT ok) AS n_orders FROM ib),
    pairs AS (
      SELECT a.brand AS brand_a, b.brand AS brand_b, COUNT(*) AS nab
      FROM ib a JOIN ib b ON a.ok = b.ok AND a.brand < b.brand
      GROUP BY a.brand, b.brand
    )
    SELECT brand_a, brand_b, nab,
           CAST(nab AS DOUBLE) / t.n_orders AS support,
           CAST(nab AS DOUBLE) / na.n AS confidence,
           CAST(nab * t.n_orders AS DOUBLE) / CAST(na.n * nbb.n AS DOUBLE) AS lift
    FROM pairs
    JOIN nb na ON na.brand = pairs.brand_a
    JOIN nb nbb ON nbb.brand = pairs.brand_b
    CROSS JOIN t
    ORDER BY lift DESC, brand_a, brand_b
    LIMIT 20
    """,
)
def q_market_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over order baskets: for every
    brand pair co-occurring in an order, support, confidence and lift
    = P(ab)·N / (n_a·n_b); top-20 by lift.

    Shape: distinct (order, brand) reduction FIRST (basket-bounded),
    pair generation via self-join on the order key (quadratic only in
    the per-basket distinct-brand count — baskets are small by
    construction, the classic market-basket bound), two brand-count
    broadcasts, and a TakeOrdered top-20.  All ratios are single
    per-row integer→double divisions; the integer products stay far
    below 2^53 (counts ≤ orders).
    """
    li = load_table(spark, sf_dir, "lineitem")
    pa = load_table(spark, sf_dir, "part")
    ib = (
        li.join(pa, li.l_partkey == pa.p_partkey)
        .select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("brand"))
        .distinct()
    )
    # ib feeds FOUR consumers (nb, t, and both self-join sides): pin the
    # small distinct basket table so the lineitem⋈part join + distinct
    # run once, not per consumer (r12; the dedup-family cached() rule).
    from project_fauna_spark.cache import cached as _cached

    ib = _cached(ib)
    nb = ib.groupBy("brand").agg(F.count(F.lit(1)).alias("n"))
    t = ib.agg(F.countDistinct("ok").alias("n_orders"))
    a = ib.select(F.col("ok"), F.col("brand").alias("brand_a"))
    b = ib.select(F.col("ok"), F.col("brand").alias("brand_b"))
    pairs = (
        a.join(b, "ok")
        .filter(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("nab"))
    )
    na = nb.select(F.col("brand").alias("brand_a"), F.col("n").alias("n_a"))
    nbb = nb.select(F.col("brand").alias("brand_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(na), "brand_a")
        .join(F.broadcast(nbb), "brand_b")
        .crossJoin(F.broadcast(t))
        .select(
            "brand_a",
            "brand_b",
            "nab",
            (F.col("nab").cast("double") / F.col("n_orders")).alias("support"),
            (F.col("nab").cast("double") / F.col("n_a")).alias("confidence"),
            (
                (F.col("nab") * F.col("n_orders")).cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double")
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "brand_a", "brand_b")
        .limit(20)
    )


_MMR_POOL = 20
_MMR_K = 5
_MMR_COS = """
  list_reduce(list_transform(range(1, len({a})+1), k -> {a}[k] * {b}[k]), (s,v) -> s+v)
  / sqrt( list_reduce(list_transform({a}, x -> x*x), (s,v) -> s+v)
        * list_reduce(list_transform({b}, x -> x*x), (s,v) -> s+v) )
"""


def _mmr_oracle_sql() -> str:
    """Unrolled MMR selection rounds as DuckDB CTE text (the
    ``llm_bpe_train_merges`` oracle-generation pattern)."""
    parts = [
        f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
    ),
    q AS (SELECT emb AS qemb FROM e WHERE vec_id = 0),
    cand AS (
      SELECT vec_id, emb, {_MMR_COS.format(a='emb', b='qemb')} AS rel
      FROM e CROSS JOIN q WHERE vec_id <> 0
      ORDER BY rel DESC, vec_id LIMIT {_MMR_POOL}
    ),
    sims AS (
      SELECT a.vec_id AS a_id, b.vec_id AS b_id,
             {_MMR_COS.format(a='a.emb', b='b.emb')} AS sim
      FROM cand a JOIN cand b ON a.vec_id <> b.vec_id
    ),
    s1 AS (SELECT vec_id, rel, rel AS score, 1 AS rnd
           FROM cand ORDER BY rel DESC, vec_id LIMIT 1),
    sel1 AS (SELECT vec_id FROM s1)"""
    ]
    for r in range(2, _MMR_K + 1):
        parts.append(f"""
    s{r} AS (
      SELECT c.vec_id, c.rel, 0.5 * c.rel - 0.5 * m.ms AS score, {r} AS rnd
      FROM cand c
      JOIN (SELECT a_id, MAX(sim) AS ms FROM sims
            WHERE b_id IN (SELECT vec_id FROM sel{r-1}) GROUP BY a_id) m
        ON m.a_id = c.vec_id
      WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{r-1})
      ORDER BY score DESC, c.vec_id LIMIT 1
    ),
    sel{r} AS (SELECT vec_id FROM sel{r-1} UNION ALL SELECT vec_id FROM s{r})""")
    union = " UNION ALL ".join(
        f"SELECT vec_id, rel, score, rnd FROM s{r}" for r in range(1, _MMR_K + 1)
    )
    return (
        ",".join(parts)
        + f"\n    SELECT vec_id, rel, score, CAST(rnd AS BIGINT) AS rnd FROM ({union})"
    )


@register("sim_mmr_diversified", oracle=_mmr_oracle_sql())
def sim_mmr_diversified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance retrieval (Carbonell & Goldstein
    1998): from the top-20 cosine candidates for query vector 0, pick 5
    results one at a time, each maximizing
    ``0.5·relevance − 0.5·max-similarity-to-already-picked`` — the
    standard diversified re-rank behind RAG retrieval and eval-set
    selection.

    Scale shape: the expensive part (candidate generation) is the
    brute/ANN top-k already covered elsewhere; MMR itself is
    pool-bounded — the 20-row pool and its 20×20 similarity matrix are
    broadcast-sized BY CONSTRUCTION, and the K selection rounds are
    unrolled joins over those tiny frames (no collect, no driver
    loop over data).  λ = 0.5 keeps every score an exact-halves
    expression; cosines are index-ordered folds, so both engines rank
    identically (vec_id tie-break).
    """
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("emb")
    )

    def cos(a, b):
        dot = F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v
        )
        na = F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, v: s + v)
        nb = F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda s, v: s + v)
        return dot / F.sqrt(na * nb)

    q = e.filter(F.col("vec_id") == 0).select(F.col("emb").alias("qemb"))
    cand = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "emb", cos(F.col("emb"), F.col("qemb")).alias("rel"))
        .orderBy(F.col("rel").desc(), "vec_id")
        .limit(_MMR_POOL)
    )
    cand = cached(cand)
    a = cand.select(F.col("vec_id").alias("a_id"), F.col("emb").alias("a_emb"))
    b = cand.select(F.col("vec_id").alias("b_id"), F.col("emb").alias("b_emb"))
    sims = (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("a_id") != F.col("b_id"))
        .select("a_id", "b_id", cos(F.col("a_emb"), F.col("b_emb")).alias("sim"))
    )
    picked = (
        cand.orderBy(F.col("rel").desc(), "vec_id")
        .limit(1)
        .select("vec_id", "rel", F.col("rel").alias("score"), F.lit(1).cast("long").alias("rnd"))
    )
    # Each round references `out` THREE times (ms, the anti-join, and
    # the unionAll), so the unrolled lineage grew 3^K copies of the
    # base plan (522 Exchange mentions in the initial plan,
    # tools/audit_plans.py r12) — pure planner overhead for a ≤5-row
    # frame.  Pinning each round's selection truncates the lineage to
    # one copy per round; rows are bounded by K=5, so the pins are
    # bytes (r12; guide §3.3 "materialise to truncate the plan").
    out = cached(picked)
    for r in range(2, _MMR_K + 1):
        sel = out.select("vec_id")
        ms = (
            sims.join(F.broadcast(sel.withColumnRenamed("vec_id", "b_id")), "b_id")
            .groupBy("a_id")
            .agg(F.max("sim").alias("ms"))
        )
        nxt = (
            cand.join(F.broadcast(sel), "vec_id", "left_anti")
            .join(F.broadcast(ms), cand.vec_id == F.col("a_id"))
            .select(
                "vec_id",
                "rel",
                (0.5 * F.col("rel") - 0.5 * F.col("ms")).alias("score"),
                F.lit(r).cast("long").alias("rnd"),
            )
            .orderBy(F.col("score").desc(), "vec_id")
            .limit(1)
        )
        out = cached(out.unionAll(nxt))
    return out


@register(
    "ingest_schema_evolution",
    oracle="""
    SELECT o_orderkey, o_orderstatus, CAST(NULL AS DOUBLE) AS o_totalprice
    FROM orders WHERE o_orderkey < 300
    UNION ALL
    SELECT o_orderkey, CAST(NULL AS VARCHAR) AS o_orderstatus, o_totalprice
    FROM orders WHERE o_orderkey >= 300 AND o_orderkey < 600
    """,
)
def ingest_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read: two parquet batches written with
    different column sets (an old-schema batch and a new-schema batch)
    are unified by ``mergeSchema`` into one frame with NULLs where a
    batch lacks a column — the lake-ingest pattern for tables whose
    schema widened over time.

    ``mergeSchema`` costs one footer read per file (not a data scan);
    at 100 TB you pin the merged schema in a metastore instead, but
    the read path under test is identical.
    """
    out = _roundtrip_dir(sf_dir, "evolve")
    o = load_table(spark, sf_dir, "orders")
    o.filter(F.col("o_orderkey") < 300).select(
        "o_orderkey", "o_orderstatus"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(out, "b1"))
    o.filter((F.col("o_orderkey") >= 300) & (F.col("o_orderkey") < 600)).select(
        "o_orderkey", "o_totalprice"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(out, "b2"))
    return (
        spark.read.option("mergeSchema", "true")
        .option("recursiveFileLookup", "true")
        .parquet(out)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )


_MH_J = 8  # minhash functions; 4 bands x 2 rows


# _h32 / _sql_h32 moved to their canonical shared homes at round 7
# (functions.wordhash.h32 / _oracle_shared.sql_h32) so new operator
# modules can use them without importing this registering module;
# aliased here for the existing call sites and oracle f-strings.
from project_fauna_spark.functions.wordhash import h32 as _h32  # noqa: E402
from project_fauna_spark.operators._oracle_shared import (  # noqa: E402
    sql_h32 as _sql_h32,
)


def _minhash_md5_oracle() -> str:
    mins = ", ".join(
        f"MIN({_sql_h32('bg', f'mh{j}:')}) AS m{j}" for j in range(_MH_J)
    )
    bands = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_id,"
        f" CAST(m{2*b} AS VARCHAR) || '_' || CAST(m{2*b+1} AS VARCHAR) AS bh FROM sig"
        for b in range(_MH_J // 2)
    )
    return f"""
    WITH bg AS (
      SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] AS bg
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
           unnest(range(1, len(ws))) AS t(i)
    ),
    sig AS (SELECT doc_id, {mins} FROM bg GROUP BY doc_id),
    bands AS ({bands}),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(COUNT(DISTINCT a.band_id) AS BIGINT) AS n_bands
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.bh = b.bh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM bg GROUP BY doc_id),
    inter AS (
      SELECT p.doc_a, p.doc_b, COUNT(*) AS ni
      FROM pairs p
      JOIN bg a ON a.doc_id = p.doc_a
      JOIN bg b ON b.doc_id = p.doc_b AND b.bg = a.bg
      GROUP BY 1, 2
    )
    SELECT p.doc_a, p.doc_b, p.n_bands,
           CAST(COALESCE(i.ni, 0) AS DOUBLE)
             / (sa.n + sb.n - COALESCE(i.ni, 0)) AS jaccard
    FROM pairs p
    LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
    JOIN sizes sa ON sa.doc_id = p.doc_a
    JOIN sizes sb ON sb.doc_id = p.doc_b
    """


@register("dedup_minhash_md5", oracle=_minhash_md5_oracle())
def dedup_minhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidates on a PORTABLE hash — the
    oracle-checkable twin of ``dedup_minhash_lsh`` (which uses
    xxhash64 and is rows-only by construction).  8 salted 32-bit
    md5-digit hashes → per-doc min signature → 4 bands of 2 rows →
    candidates share a band; every candidate pair is then verified
    with its exact bigram Jaccard.

    Same scale shape as the production twin: signatures are 8 longs
    per doc, the band join ships (doc_id, band_id, band_hash) rows
    only, and the exact verify is candidate-bounded (the two-phase
    sketch-then-verify recipe).  From ``functions.shingles`` the
    bigram builder's lambda touches only its element.
    """
    from project_fauna_spark.functions.shingles import word_bigrams

    d = load_table(spark, sf_dir, "documents")
    bg = d.select(
        "doc_id", F.explode(word_bigrams(F.col("text"))).alias("bg")
    ).distinct()
    sig = bg.groupBy("doc_id").agg(
        *[F.min(_h32(F.col("bg"), f"mh{j}:")).alias(f"m{j}") for j in range(_MH_J)]
    )
    # Recompute-everything spelling, KEPT DELIBERATELY (r12 A/B): both
    # "obvious" optimizations were measured slower on this query —
    # (a) replacing the 4-way unionAll of per-band projections with one
    # posexplode over a band array was 1.5x slower (the union lets the
    # planner prune each sig copy down to the two mins that band needs,
    # so the 8 thin aggregates beat 2 fat ones), and (b) the
    # candidate-bounded verify (persist pairs, semi-join the corpus to
    # pair participants) was 2.5-3x slower — the persist barrier on
    # `pairs` costs far more than the cheap full-corpus bigram passes it
    # saves, the same effect BASELINE.md's earlier A/B recorded for a
    # persist of the signature chain.  Numbers in OPTIMIZATION_r12.md.
    band_frames = [
        sig.select(
            "doc_id",
            F.lit(b).alias("band_id"),
            F.concat_ws("_", F.col(f"m{2*b}"), F.col(f"m{2*b+1}")).alias("bh"),
        )
        for b in range(_MH_J // 2)
    ]
    import functools as _ft

    bands = _ft.reduce(lambda x, y: x.unionAll(y), band_frames)
    a = bands.select(
        F.col("doc_id").alias("doc_a"), "band_id", "bh"
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"), "band_id", "bh"
    )
    pairs = (
        a.join(b, ["band_id", "bh"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.countDistinct("band_id").alias("n_bands"))
    )
    sizes = bg.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    bga = bg.select(F.col("doc_id").alias("doc_a"), F.col("bg"))
    bgb = bg.select(F.col("doc_id").alias("doc_b"), F.col("bg"))
    inter = (
        pairs.join(bga, "doc_a")
        .join(bgb, ["doc_b", "bg"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("ni"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (
        pairs.join(inter, ["doc_a", "doc_b"], "left")
        .join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_bands",
            (
                F.coalesce(F.col("ni"), F.lit(0)).cast("double")
                / (F.col("na") + F.col("nb") - F.coalesce(F.col("ni"), F.lit(0)))
            ).alias("jaccard"),
        )
    )


def _bpe_encode_round(prev: str, r: int) -> str:
    """One BPE merge round retaining the word key: count pairs over
    {prev}(word, seq, n), adopt the top rule, rewrite seq → e{r}."""
    return f"""
    pc{r} AS (
      SELECT pair, CAST(SUM(n) AS BIGINT) AS cnt FROM (
        SELECT unnest([syms[i] || ' ' || syms[i+1] for i in range(1, len(syms))]) AS pair, n
        FROM (SELECT string_split(trim(seq), ' ') AS syms, n FROM {prev})
        WHERE len(syms) >= 2
      ) GROUP BY pair
    ),
    rule{r} AS (SELECT pair FROM pc{r} ORDER BY cnt DESC, pair LIMIT 1),
    e{r} AS (
      SELECT word,
             replace({prev}.seq, ' ' || t.pair || ' ',
                     ' ' || replace(t.pair, ' ', '') || ' ') AS seq, n
      FROM {prev}, rule{r} t
    )"""


@register(
    "llm_bpe_encode_corpus",
    oracle=f"""
    WITH wc AS (
      SELECT word, COUNT(*) AS n FROM (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents
      ) WHERE word <> '' GROUP BY word
    ),
    e0 AS (
      SELECT word,
             ' ' || array_to_string([word[i:i] for i in range(1, length(word)+1)], ' ')
               || ' ' AS seq, n
      FROM wc
    ),
    {_bpe_encode_round('e0', 1)},
    {_bpe_encode_round('e1', 2)},
    {_bpe_encode_round('e2', 3)},
    tok AS (SELECT word, len(string_split(trim(seq), ' ')) AS n_sym FROM e3),
    dw AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    )
    SELECT dw.doc_id,
           COUNT(*) AS n_words,
           CAST(SUM(t.n_sym) AS BIGINT) AS n_bpe_tokens,
           CAST(SUM(length(dw.word)) AS BIGINT) AS n_chars,
           CAST(SUM(length(dw.word)) AS DOUBLE) / SUM(t.n_sym) AS chars_per_token
    FROM dw JOIN tok t USING (word)
    WHERE dw.word <> ''
    GROUP BY dw.doc_id
    """,
)
def llm_bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tokenizer-APPLY half of the BPE lifecycle: train 3 merge
    rules on the word-type table (same loop as
    ``llm_bpe_train_merges``), encode every word type with them, and
    report per-document word/BPE-token/char counts and the
    chars-per-token compression ratio — the number a tokenizer change
    is actually judged by.

    Scale: training and encoding touch only word TYPES (vocabulary-
    bounded, with corpus weights); the corpus-sized stream is one
    explode joined against the tiny word→token-count map (AQE
    broadcasts it).  Counts are integers; the ratio is one per-row
    double division at the edge.
    """
    d = load_table(spark, sf_dir, "documents")
    wc = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    chars = F.filter(F.split(F.col("word"), ""), lambda c: c != F.lit(""))
    cur = wc.select(
        "word",
        F.concat(F.lit(" "), F.array_join(chars, " "), F.lit(" ")).alias("seq"),
        "n",
    )
    for _ in range(3):
        syms = F.split(F.trim(F.col("seq")), " ")
        k = F.greatest(F.size(syms) - 1, F.lit(0))
        zipped = F.slice(
            F.arrays_zip(syms.alias("a"), F.slice(syms, 2, k).alias("b")), 1, k
        )
        pairs = F.transform(zipped, lambda z: F.concat(z.a, F.lit(" "), z.b))
        rule = (
            cur.select(F.explode(pairs).alias("pair"), "n")
            .groupBy("pair")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "pair")
            .limit(1)
            .select("pair")
        )
        cur = cur.crossJoin(F.broadcast(rule)).select(
            "word",
            F.replace(
                F.col("seq"),
                F.concat(F.lit(" "), F.col("pair"), F.lit(" ")),
                F.concat(
                    F.lit(" "),
                    F.replace(F.col("pair"), F.lit(" "), F.lit("")),
                    F.lit(" "),
                ),
            ).alias("seq"),
            "n",
        )
        cur = cached(cur)  # each round reads cur TWICE (rule + rewrite): without
        # this the vocab subtree replicates 2^rounds times in the plan
    tok = cur.select(
        "word", F.size(F.split(F.trim(F.col("seq")), " ")).alias("n_sym")
    )
    dw = d.select("doc_id", F.explode(F.split("text", " ")).alias("word")).filter(
        F.col("word") != ""
    )
    return (
        dw.join(tok, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sym").cast("long").alias("n_bpe_tokens"),
            F.sum(F.length("word")).cast("long").alias("n_chars"),
        )
        .withColumn(
            "chars_per_token",
            F.col("n_chars").cast("double") / F.col("n_bpe_tokens"),
        )
    )


@register(
    "dq_freshness_lag",
    oracle="""
    WITH m AS (
      SELECT event_type, MAX(ts) AS max_ts, COUNT(*) AS n
      FROM events GROUP BY event_type
    ),
    g AS (SELECT MAX(ts) AS gmax FROM events)
    SELECT m.event_type, m.n,
           strftime(m.max_ts, '%Y-%m-%d %H:%M:%S.%f') AS max_ts,
           CAST((epoch_us(g.gmax) - epoch_us(m.max_ts)) // 60000000 AS BIGINT)
             AS lag_minutes,
           (epoch_us(g.gmax) - epoch_us(m.max_ts)) // 60000000 > 60 AS is_stale
    FROM m CROSS JOIN g
    """,
)
def dq_freshness_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-freshness audit: per event type, the newest timestamp, its
    lag behind the globally newest event in whole minutes, and a
    staleness flag (> 60 min) — the first dashboard any ingestion
    pipeline gets.

    Two map-combined aggregates (per-type and global max), one 1-row
    broadcast; the lag is integer µs arithmetic (floor-div), no float
    edge at all.  Timestamps format at the compared edge per the as-of
    convention.
    """
    e = load_table(spark, sf_dir, "events")
    m = e.groupBy("event_type").agg(
        F.max("ts").alias("max_ts"), F.count(F.lit(1)).alias("n")
    )
    g = e.agg(F.max("ts").alias("gmax"))
    lag = F.floor(
        (F.unix_micros(F.col("gmax")) - F.unix_micros(F.col("max_ts"))) / 60000000
    ).cast("long")
    return m.crossJoin(F.broadcast(g)).select(
        "event_type",
        "n",
        F.date_format("max_ts", TS_FMT_US).alias("max_ts"),
        lag.alias("lag_minutes"),
        (lag > 60).alias("is_stale"),
    )


@register(
    "q_semi_additive_snapshot",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey,
             strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
             o_totalprice,
             row_number() OVER (PARTITION BY o_custkey, date_trunc('month', o_orderdate)
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    )
    SELECT month,
           COUNT(*) AS n_accounts,
           CAST(CAST(SUM(CAST(CAST(o_totalprice AS VARCHAR) AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE)
             AS total_balance
    FROM ranked WHERE rn = 1
    GROUP BY month
    """,
)
def q_semi_additive_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-additive measure: treating each customer's latest order
    amount in a month as their end-of-month balance, the monthly book
    total sums the LAST value per account — never the sum over time —
    the defining aggregation rule for balances/inventory in any
    warehouse.

    One window keyed on (custkey, month) — WindowGroupLimit prunes to
    the top row per key before the shuffle completes — then a
    keyspace-sized decimal-exact aggregate per month.
    """
    o = load_table(spark, sf_dir, "orders")
    month = F.date_trunc("month", F.col("o_orderdate"))
    w = W.partitionBy("o_custkey", month).orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy(F.date_format(month, "yyyy-MM-dd").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_accounts"),
            F.sum(F.col("o_totalprice").cast("decimal(30,8)"))
            .cast("double")
            .alias("total_balance"),
        )
    )


def _ann_recall_oracle() -> str:
    from project_fauna_spark.plans.registry import ORACLE

    ivf_sql = ORACLE["sim_ann_ivf"]
    return f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, emb AS qemb FROM e WHERE vec_id % 50 = 0),
    brute AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY
  list_reduce(list_transform(range(1, len(q.qemb)+1), k -> q.qemb[k] * e.emb[k]), (s,v) -> s+v)
  / sqrt( list_reduce(list_transform(q.qemb, x -> x*x), (s,v) -> s+v)
        * list_reduce(list_transform(e.emb, x -> x*x), (s,v) -> s+v) ) DESC,
                 e.vec_id) AS rk
        FROM q JOIN e ON e.vec_id <> q.query_id
      ) WHERE rk <= 5
    ),
    ivf AS (SELECT query_id, neighbor_id FROM ({ivf_sql}) WHERE rank <= 5),
    hits AS (
      SELECT b.query_id, COUNT(i.neighbor_id) AS n_hits
      FROM brute b
      LEFT JOIN ivf i ON i.query_id = b.query_id AND i.neighbor_id = b.neighbor_id
      GROUP BY b.query_id
    )
    SELECT query_id, CAST(n_hits AS BIGINT) AS n_hits,
           CAST(n_hits AS DOUBLE) / 5 AS recall_at_5
    FROM hits
    """


@register("sim_ann_recall_audit", oracle=_ann_recall_oracle())
def sim_ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality evaluation: recall@5 of the IVF index
    (``sim_ann_ivf``, nprobe=2) against exact brute-force top-5 for
    the same 20-query probe set — the measurement loop every ANN
    deployment runs before trading exactness for speed.

    The exact side broadcasts the query set over one linear corpus
    scan (WindowGroupLimit top-5); the approximate side is the
    registered IVF plan reused as a subplan.  The hit join and the
    per-query recall are integer counts and one per-row division —
    recall is exact, so the driver hash-matches it.
    """
    from project_fauna_spark.functions.vectors import cosine_sim
    from project_fauna_spark.operators.llm_extras import sim_ann_ivf

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("emb")
    )
    q = e.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), "neighbor_id")
    brute = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine_sim(F.col("emb"), F.col("qemb")).alias("cos"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("query_id", "neighbor_id")
    )
    ivf = (
        sim_ann_ivf(spark, sf_dir)
        .filter(F.col("rank") <= 5)
        .select("query_id", F.col("neighbor_id").alias("ivf_neighbor"))
    )
    hits = (
        brute.join(
            ivf,
            (brute.query_id == ivf.query_id)
            & (F.col("neighbor_id") == F.col("ivf_neighbor")),
            "left",
        )
        .groupBy(brute.query_id)
        .agg(F.count("ivf_neighbor").alias("n_hits"))
    )
    return hits.select(
        "query_id",
        F.col("n_hits").cast("long").alias("n_hits"),
        (F.col("n_hits").cast("double") / 5).alias("recall_at_5"),
    )


@register(
    "dq_k_anonymity",
    oracle="""
    WITH g AS (
      SELECT c_nationkey, c_mktsegment, COUNT(*) AS group_size
      FROM customer GROUP BY c_nationkey, c_mktsegment
    ),
    k AS (SELECT MIN(group_size) AS k_anonymity FROM g)
    SELECT g.c_nationkey, g.c_mktsegment, g.group_size, k.k_anonymity,
           g.group_size < 5 AS violates_k5
    FROM g CROSS JOIN k
    """,
)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the (nationkey, mktsegment)
    quasi-identifier: every equivalence class's size, the dataset's
    k (the smallest class), and a flag for classes under k=5 — the
    re-identification screen run before releasing training data
    derived from user records.

    One map-combined aggregate over the quasi-identifier plus a 1-row
    broadcast of the global minimum; integers only.  At 100 TB the
    class table is |QI-combinations|-sized, not data-sized.
    """
    c = load_table(spark, sf_dir, "customer")
    g = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("group_size")
    )
    k = g.agg(F.min("group_size").alias("k_anonymity"))
    return g.crossJoin(F.broadcast(k)).select(
        "c_nationkey",
        "c_mktsegment",
        "group_size",
        "k_anonymity",
        (F.col("group_size") < 5).alias("violates_k5"),
    )


@register(
    "dq_key_skew_profile",
    oracle="""
    WITH kc AS (
      SELECT l_suppkey, COUNT(*) AS n FROM lineitem GROUP BY l_suppkey
    ),
    stats AS (
      SELECT CAST(MAX(n) AS BIGINT) AS max_n,
             CAST(SUM(n) AS BIGINT) AS total,
             COUNT(*) AS n_keys
      FROM kc
    )
    SELECT kc.l_suppkey, kc.n,
           CAST(kc.n AS DOUBLE) / s.total AS share,
           CAST(kc.n AS DOUBLE) * s.n_keys / s.total AS skew_ratio,
           CAST(rk AS BIGINT) AS rk
    FROM (SELECT *, row_number() OVER (ORDER BY n DESC, l_suppkey) AS rk FROM kc) kc
    CROSS JOIN stats s
    WHERE rk <= 10
    """,
)
def dq_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join skew diagnostic: the 10 hottest join-key values of
    lineitem.l_suppkey with their traffic share and skew ratio
    (key count ÷ mean key count) — the numbers that decide whether a
    join needs salting (``join_salted_equi``) or AQE skew splitting.

    One map-combined key-count aggregate (keyspace-sized), a 1-row
    stats broadcast, and a TakeOrdered top-10; shares are per-row
    divisions of exact integers.
    """
    li = load_table(spark, sf_dir, "lineitem")
    kc = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("n"))
    stats = kc.agg(
        F.max("n").alias("max_n"),
        F.sum("n").alias("total"),
        F.count(F.lit(1)).alias("n_keys"),
    )
    ranked = kc.withColumn(
        "rk", F.row_number().over(W.orderBy(F.col("n").desc(), "l_suppkey")).cast("long")
    ).filter(F.col("rk") <= 10)
    return ranked.crossJoin(F.broadcast(stats)).select(
        "l_suppkey",
        "n",
        (F.col("n").cast("double") / F.col("total")).alias("share"),
        (F.col("n").cast("double") * F.col("n_keys") / F.col("total")).alias(
            "skew_ratio"
        ),
        "rk",
    )


@register(
    "ml_standardize_audit",
    oracle="""
    WITH x AS (
      SELECT vec_id, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS v
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
    ),
    m AS (
      SELECT dim,
             COUNT(*) AS n,
             CAST(CAST(SUM(CAST(CAST(v AS VARCHAR) AS DECIMAL(30,12))) AS VARCHAR) AS DOUBLE) AS s1,
             CAST(CAST(SUM(CAST(CAST(v * v AS VARCHAR) AS DECIMAL(30,12))) AS VARCHAR) AS DOUBLE) AS s2
      FROM x GROUP BY dim
    ),
    stats AS (
      SELECT dim, n, s1 / n AS mean,
             sqrt(s2 / n - (s1 / n) * (s1 / n)) AS std
      FROM m
    )
    SELECT s.dim, s.n, s.mean, s.std,
           CAST(SUM(CASE WHEN abs((x.v - s.mean) / s.std) > 3.0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers_3sigma
    FROM x JOIN stats s USING (dim)
    GROUP BY s.dim, s.n, s.mean, s.std
    """,
)
def ml_standardize_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-standardization audit: per embedding dimension, the
    mean, population std (from decimal-exact first/second moments —
    ``sqrt`` is IEEE-exact, ``stddev``'s streaming accumulation is
    not), and the count of |z| > 3 outliers after standardization —
    the scaler-fit + sanity-check step of a feature pipeline.

    One posexplode (corpus × 64 rows), a map-combined per-dim moment
    aggregate (64 groups), a broadcast join back for the z-pass.
    Bounded state everywhere; no windows.
    """
    e = load_table(spark, sf_dir, "embeddings")
    x = e.select(
        "vec_id", F.posexplode(F.transform("embedding", lambda c: c.cast("double")))
    ).select("vec_id", F.col("pos").alias("dim"), F.col("col").alias("v"))
    m = x.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v").cast("decimal(30,12)")).cast("double").alias("s1"),
        F.sum((F.col("v") * F.col("v")).cast("decimal(30,12)")).cast("double").alias("s2"),
    )
    stats = m.select(
        "dim",
        "n",
        (F.col("s1") / F.col("n")).alias("mean"),
        F.sqrt(
            F.col("s2") / F.col("n") - (F.col("s1") / F.col("n")) * (F.col("s1") / F.col("n"))
        ).alias("std"),
    )
    return (
        x.join(F.broadcast(stats), "dim")
        .groupBy("dim", "n", "mean", "std")
        .agg(
            F.sum(
                F.when(F.abs((F.col("v") - F.col("mean")) / F.col("std")) > 3.0, 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("n_outliers_3sigma")
        )
    )


_XM_COS = """
  list_reduce(list_transform(range(1, len({a})+1), k -> {a}[k] * {b}[k]), (s,v) -> s+v)
  / sqrt( list_reduce(list_transform({a}, x -> x*x), (s,v) -> s+v)
        * list_reduce(list_transform({b}, x -> x*x), (s,v) -> s+v) )
"""


@register(
    "dedup_cross_modal_agreement",
    oracle=f"""
    WITH bg AS (
      SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] AS bg
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
           unnest(range(1, len(ws))) AS t(i)
    ),
    dfreq AS (SELECT bg, COUNT(*) AS df FROM bg GROUP BY bg),
    rare AS (SELECT bg.doc_id, bg.bg FROM bg JOIN dfreq USING (bg) WHERE dfreq.df <= 20),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM bg GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS ni
      FROM rare a JOIN rare b ON a.bg = b.bg AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    full_inter AS (
      SELECT i.doc_a, i.doc_b, COUNT(*) AS ni
      FROM inter i
      JOIN bg a ON a.doc_id = i.doc_a
      JOIN bg b ON b.doc_id = i.doc_b AND b.bg = a.bg
      GROUP BY 1, 2
    ),
    top AS (
      SELECT f.doc_a, f.doc_b,
             CAST(f.ni AS DOUBLE) / (sa.n + sb.n - f.ni) AS jaccard
      FROM full_inter f
      JOIN sizes sa ON sa.doc_id = f.doc_a
      JOIN sizes sb ON sb.doc_id = f.doc_b
      ORDER BY jaccard DESC, f.doc_a, f.doc_b LIMIT 100
    ),
    e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
    )
    SELECT t.doc_a, t.doc_b, t.jaccard,
           {_XM_COS.format(a='ea.emb', b='eb.emb')} AS cos,
           {_XM_COS.format(a='ea.emb', b='eb.emb')} >= 0.2 AS semantic_agree
    FROM top t
    JOIN e ea ON ea.vec_id = t.doc_a
    JOIN e eb ON eb.vec_id = t.doc_b
    """,
)
def dedup_cross_modal_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal dedup consistency audit: the top-100 text-overlap
    pairs (exact bigram Jaccard, candidates blocked on rare shared
    bigrams df ≤ 20) annotated with their embedding cosine and a
    semantic-agreement flag — the QA step that catches a text-dedup
    and an embedding-dedup pass disagreeing about what "duplicate"
    means before one of them deletes training data.

    Candidate generation is the inverted-index + stop-shingle-prune
    shape (never all-pairs); the top-100 is a TakeOrdered; the
    embedding join touches 200 broadcast-sized rows.  Jaccard is an
    integer ratio, the cosine an index-ordered fold — both exact.
    """
    from project_fauna_spark.functions.shingles import word_bigrams
    from project_fauna_spark.functions.vectors import cosine_sim

    d = load_table(spark, sf_dir, "documents")
    bg = d.select(
        "doc_id", F.explode(word_bigrams(F.col("text"))).alias("bg")
    ).distinct()
    dfreq = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("df"))
    rare = bg.join(dfreq.filter(F.col("df") <= 20), "bg").select("doc_id", "bg")
    ra = rare.select(F.col("doc_id").alias("doc_a"), "bg")
    rb = rare.select(F.col("doc_id").alias("doc_b"), "bg")
    cand = (
        ra.join(rb, "bg")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    # Candidate-bounded verify (r12, the dedup_ngram_jaccard pattern-2
    # fix): pin the tiny pair set, semi-join the corpus down to
    # pair-participant ids, and build the distinct-bigram frame for
    # those docs ONLY — the old spelling re-ran the full-corpus explode
    # three more times (sizes + both verify join sides).  Inner joins
    # on the pair ids are unchanged by pruning to pair participants,
    # and per-doc bigram counts are per-doc properties of the same
    # text, so sizes values are identical for every surviving pair.
    cand = cached(cand)
    cand_ids = cand.select(
        F.explode(F.array("doc_a", "doc_b")).alias("doc_id")
    ).distinct()
    # bgc itself feeds THREE consumers (sizes + both verify join
    # sides); it is candidate-bounded, so the pin is output-sized.
    bgc = cached(
        d.join(cand_ids, "doc_id", "left_semi")
        .select("doc_id", F.explode(word_bigrams(F.col("text"))).alias("bg"))
        .distinct()
    )
    sizes = bgc.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    bga = bgc.select(F.col("doc_id").alias("doc_a"), "bg")
    bgb = bgc.select(F.col("doc_id").alias("doc_b"), "bg")
    full_inter = (
        cand.join(bga, "doc_a")
        .join(bgb, ["doc_b", "bg"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("ni"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    top = (
        full_inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("ni").cast("double")
                / (F.col("na") + F.col("nb") - F.col("ni"))
            ).alias("jaccard"),
        )
        .orderBy(F.col("jaccard").desc(), "doc_a", "doc_b")
        .limit(100)
    )
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("emb")
    )
    ea = e.select(F.col("vec_id").alias("doc_a"), F.col("emb").alias("emb_a"))
    eb = e.select(F.col("vec_id").alias("doc_b"), F.col("emb").alias("emb_b"))
    cos = cosine_sim(F.col("emb_a"), F.col("emb_b"))
    return (
        top.join(ea, "doc_a")
        .join(eb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "jaccard",
            cos.alias("cos"),
            (cos >= 0.2).alias("semantic_agree"),
        )
    )


@register(
    "ml_knn_classify_eval",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, label AS true_label, emb AS qemb
          FROM e WHERE vec_id < 50),
    nn AS (
      SELECT query_id, true_label, label AS nn_label FROM (
        SELECT q.query_id, q.true_label, e.label,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY {_XM_COS.format(a='q.qemb', b='e.emb')} DESC, e.vec_id) AS rk
        FROM q JOIN e ON e.vec_id <> q.query_id
      ) WHERE rk <= 5
    ),
    votes AS (
      SELECT query_id, true_label, nn_label, COUNT(*) AS v
      FROM nn GROUP BY 1, 2, 3
    ),
    pred AS (
      SELECT query_id, true_label, nn_label AS pred_label FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY v DESC, nn_label) AS pr
        FROM votes
      ) WHERE pr = 1
    )
    SELECT true_label AS label,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END) AS BIGINT)
             AS n_correct,
           CAST(SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS accuracy
    FROM pred GROUP BY true_label
    """,
)
def ml_knn_classify_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN-classifier evaluation: 5-nearest-neighbor majority vote
    (cosine, deterministic smallest-label tie-break) predicts each of
    the first 50 vectors' labels; per-label accuracy — the standard
    embedding-quality probe (a good embedding space classifies its own
    labels).

    The expensive part is the brute top-5 (broadcast query set ×
    linear scan, WindowGroupLimit); voting and accuracy are
    keyspace-sized integer aggregates.
    """
    from project_fauna_spark.functions.vectors import cosine_sim

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("emb"),
    )
    q = e.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("true_label"),
        F.col("emb").alias("qemb"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), "vec_id")
    nn = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "true_label",
            F.col("label").alias("nn_label"),
            "vec_id",
            cosine_sim(F.col("qemb"), F.col("emb")).alias("cos"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
    )
    votes = nn.groupBy("query_id", "true_label", "nn_label").agg(
        F.count(F.lit(1)).alias("v")
    )
    wv = W.partitionBy("query_id").orderBy(F.col("v").desc(), "nn_label")
    pred = (
        votes.withColumn("pr", F.row_number().over(wv))
        .filter(F.col("pr") == 1)
        .select("query_id", "true_label", F.col("nn_label").alias("pred_label"))
    )
    correct = F.sum(
        F.when(F.col("pred_label") == F.col("true_label"), 1).otherwise(0)
    )
    return pred.groupBy(F.col("true_label").alias("label")).agg(
        F.count(F.lit(1)).alias("n"),
        correct.cast("long").alias("n_correct"),
        (correct.cast("double") / F.count(F.lit(1))).alias("accuracy"),
    )


@register(
    "llm_e2e_dataset_build",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, text, lang,
             len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_words,
             n_chars
      FROM documents
    ),
    gated AS (
      SELECT * FROM base WHERE n_chars >= 100 AND n_words >= 20
    ),
    deduped AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        FROM gated
      ) WHERE rn = 1
    ),
    eval_docs AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0),
    eval_grams AS (
      SELECT DISTINCT array_to_string(ws[i:i+{_GRAM_K - 1}], ' ') AS gram
      FROM (SELECT string_split(text, ' ') AS ws FROM eval_docs),
           unnest(range(1, len(ws) - {_GRAM_K - 2})) AS t(i)
    ),
    contaminated AS (
      SELECT DISTINCT d.doc_id
      FROM (
        SELECT doc_id, array_to_string(ws[i:i+{_GRAM_K - 1}], ' ') AS gram
        FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM deduped),
             unnest(range(1, len(ws) - {_GRAM_K - 2})) AS t(i)
      ) d JOIN eval_grams g ON d.gram = g.gram
      WHERE d.doc_id % 97 <> 0
    ),
    clean AS (
      SELECT * FROM deduped
      WHERE doc_id % 97 <> 0
        AND doc_id NOT IN (SELECT doc_id FROM contaminated)
    ),
    t AS (SELECT CAST(SUM(n_words) AS BIGINT) AS total_tokens FROM clean)
    SELECT c.lang,
           COUNT(*) AS n_docs,
           CAST(SUM(c.n_words) AS BIGINT) AS n_tokens,
           CAST(SUM(c.n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(c.n_words) AS DOUBLE) / t.total_tokens AS token_share
    FROM clean c CROSS JOIN t
    GROUP BY c.lang, t.total_tokens
    """,
)
def llm_e2e_dataset_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship composed curation pipeline, ONE lazy plan: quality gate
    (length + token-count thresholds) → exact dedup (first doc per
    verbatim text) → eval-set decontamination (drop any training doc
    sharing an 8-token gram with the held-out eval slice, and the eval
    slice itself) → per-language dataset manifest with token shares —
    the minimal end-to-end shape of a real pretraining-data build.

    Every stage is the scale shape proven by its standalone operator:
    the gate is a pushed filter, dedup is a WindowGroupLimit on the
    text key, decontamination broadcasts the eval-gram set into an
    anti-join (eval sets are small by construction), and the manifest
    is a keyspace-sized aggregate.  Catalyst pipelines all four into
    one job; nothing materializes between stages.
    """
    d = load_table(spark, sf_dir, "documents")
    base = d.withColumn(
        "n_words",
        F.size(F.filter(F.split("text", " "), lambda w: w != F.lit(""))),
    )
    gated = base.filter((F.col("n_chars") >= 100) & (F.col("n_words") >= 20))
    w = W.partitionBy("text").orderBy("doc_id")
    deduped = (
        gated.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
    )
    eval_docs = d.filter(F.col("doc_id") % 97 == 0)
    eval_grams = (
        eval_docs.select(F.explode(_token_grams(F.col("text"))).alias("gram"))
        .distinct()
    )
    train = deduped.filter(F.col("doc_id") % 97 != 0)
    train_grams = train.select(
        "doc_id", F.explode(_token_grams(F.col("text"))).alias("gram")
    )
    contaminated = (
        train_grams.join(F.broadcast(eval_grams), "gram").select("doc_id").distinct()
    )
    clean = train.join(contaminated, "doc_id", "left_anti")
    # r12: corpus token total from the per-language manifest itself,
    # not a second full pass over `clean` — the unpinned two-consumer
    # spelling ran the whole gate→dedup→decontaminate pipeline TWICE
    # (once for the scalar total, once for the manifest).  Σ per-lang
    # sum(n_words) == sum(n_words) over clean exactly (int64), so
    # token_share divides the identical values (the llm_ccnet_buckets
    # totals-from-the-aggregate identity).  The manifest is pinned
    # (|langs| rows) because the total now derives from it.
    from project_fauna_spark.cache import cached

    manifest = cached(
        clean.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").cast("long").alias("n_tokens"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )
    t = manifest.agg(F.sum("n_tokens").alias("total_tokens"))
    return manifest.crossJoin(F.broadcast(t)).select(
        "lang",
        "n_docs",
        "n_tokens",
        "total_chars",
        (F.col("n_tokens").cast("double") / F.col("total_tokens")).alias(
            "token_share"
        ),
    )


def _distributed_cumsum(df, order_cols, val_col: str, out_col: str):
    """Exact GLOBAL running sum with no single-partition window: the
    cumsum sibling of ``eventseries._distributed_ntile`` /
    ``curation._grouped_ntile``.  Range-repartition on the total order,
    local cumsum per range partition, then add each partition's
    broadcast prefix total.  Values here are integers (±1 deltas), so
    associativity is exact."""
    ranged = df.repartitionByRange(*order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_local = (
        W.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # `local` feeds TWO branches (the per-partition totals grid and the
    # final offset join) — uncached, each branch re-derived the whole
    # upstream (for event_concurrency_gauge, the full sessionize
    # pipeline).  One pin caps it at one pass, and `totals` now reads
    # the SAME pinned rows (sum per _pid is identical on ranged and
    # local — the window only appends _lcs).  r12; the
    # _distributed_ntile / _grouped_ntile sibling fix, guide §5.
    local = cached(ranged.withColumn("_lcs", F.sum(val_col).over(w_local)))
    totals = local.groupBy("_pid").agg(F.sum(val_col).alias("_t"))
    prior = totals.select(F.col("_pid").alias("_pid2"), F.col("_t").alias("_t2"))
    offsets = (
        totals.join(F.broadcast(prior), F.col("_pid2") < F.col("_pid"), "left")
        .groupBy("_pid")
        .agg(F.coalesce(F.sum("_t2"), F.lit(0)).alias("_off"))
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_lcs") + F.col("_off")).cast("long"))
        .drop("_pid", "_lcs", "_off")
    )


@register(
    "event_concurrency_gauge",
    oracle="""
    WITH e AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                    OR lag(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id,
             SUM(new_session) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING)
               AS session_no,
             ts
      FROM e
    ),
    sess AS (
      SELECT user_id, session_no, MIN(ts) AS s_start, MAX(ts) AS s_end
      FROM s GROUP BY user_id, session_no
    ),
    deltas AS (
      SELECT s_start AS ts, 1 AS delta, user_id, session_no FROM sess
      UNION ALL
      SELECT s_end AS ts, -1 AS delta, user_id, session_no FROM sess
    ),
    gauge AS (
      SELECT ts,
             CAST(SUM(delta) OVER (ORDER BY ts, delta, user_id, session_no
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS concurrency
      FROM deltas
    )
    SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           MAX(concurrency) AS max_concurrency
    FROM gauge GROUP BY 1
    """,
)
def event_concurrency_gauge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent-sessions gauge per day: sessionize each user's
    events (30-min gap), sweep-line the session intervals (+1 at
    start, −1 at end, ends sort before starts at equal timestamps),
    and report each day's maximum concurrency — the capacity-planning
    metric that requires a GLOBAL running sum.

    The global cumsum is the textbook single-partition window trap;
    here it is an exact distributed cumsum (:func:`_distributed_cumsum`
    — range repartition + per-partition prefix + broadcast offsets),
    the same two-level pattern as the distributed NTILE. Session
    building shuffles once on user_id; deltas are ±1 integers so the
    distributed reassembly is exact.
    """
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    marked = e.withColumn(
        "new_session",
        F.when((gap > 1800000000) | F.lag("ts").over(w).isNull(), 1).otherwise(0),
    )
    # event_id tie-break: equal-ts rows at a session boundary must fold
    # in ONE order in both engines, or session_no (and everything
    # downstream) becomes nondeterministic (ADVICE r3).
    w2 = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    s = marked.withColumn("session_no", F.sum("new_session").over(w2))
    sess = s.groupBy("user_id", "session_no").agg(
        F.min("ts").alias("s_start"), F.max("ts").alias("s_end")
    )
    # ONE explode instead of unionAll(starts, ends): the union spelling
    # referenced the (uncached) sessionize+aggregate subtree twice, so
    # the whole per-user window pipeline executed twice when the cumsum
    # materialized (r12; the CC edge-build pattern-1 fix).  The explode
    # emits exactly the same (ts, delta, user_id, session_no) multiset
    # from a single sessionize pass.
    deltas = sess.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("s_start").alias("ts"),
                    F.lit(1).alias("delta"),
                    F.col("user_id"),
                    F.col("session_no"),
                ),
                F.struct(
                    F.col("s_end").alias("ts"),
                    F.lit(-1).alias("delta"),
                    F.col("user_id"),
                    F.col("session_no"),
                ),
            )
        ).alias("e")
    ).select("e.ts", "e.delta", "e.user_id", "e.session_no")
    gauge = _distributed_cumsum(
        deltas, [F.col("ts"), F.col("delta"), F.col("user_id"), F.col("session_no")],
        "delta", "concurrency",
    )
    return gauge.groupBy(
        F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day")
    ).agg(F.max("concurrency").alias("max_concurrency"))


@register(
    "dq_completeness_by_day",
    oracle="""
    WITH bounds AS (
      SELECT CAST(MIN(ts) AS DATE) AS d0, CAST(MAX(ts) AS DATE) AS d1 FROM events
    ),
    spine AS (
      SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      FROM bounds
    ),
    daily AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n FROM events GROUP BY 1
    )
    SELECT strftime(s.day, '%Y-%m-%d') AS day,
           CAST(COALESCE(d.n, 0) AS BIGINT) AS n_events,
           (d.n IS NULL) AS is_gap
    FROM spine s LEFT JOIN daily d USING (day)
    """,
)
def dq_completeness_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal completeness audit: a generated calendar spine from
    the first to the last event day, left-joined against daily counts
    — every zero-event day surfaces as an explicit gap row instead of
    silently missing from a GROUP BY, the difference between "no data"
    and "no row".

    The spine is `sequence()` over a 1-row bounds aggregate (exploded
    calendar-sized, broadcast); daily counts are one map-combined
    aggregate.
    """
    e = load_table(spark, sf_dir, "events")
    bounds = e.agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.max(F.col("ts").cast("date")).alias("d1"),
    )
    spine = bounds.select(
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day")
    )
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    # A left-outer join can only build-broadcast the RIGHT side — a
    # broadcast hint on the preserved spine is ignored (ADVICE r3).
    # `daily` is calendar-sized after aggregation, so it is the
    # correct build side.
    return (
        spine
        .join(F.broadcast(daily), "day", "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
            F.col("n").isNull().alias("is_gap"),
        )
    )


@register(
    "event_position_attribution",
    oracle="""
    WITH p AS (
      SELECT event_id AS conv_id, user_id, ts AS conv_ts
      FROM events WHERE event_type = 'purchase'
    ),
    touches AS (
      SELECT p.conv_id, e.event_type AS channel, e.ts, e.event_id
      FROM p JOIN events e
        ON e.user_id = p.user_id
       AND e.event_type IN ('view', 'click')
       AND e.ts <= p.conv_ts
       AND e.ts >= p.conv_ts - INTERVAL 7 DAY
    ),
    ranked AS (
      SELECT conv_id, channel,
             row_number() OVER (PARTITION BY conv_id ORDER BY ts, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY conv_id) AS n
      FROM touches
    ),
    credited AS (
      SELECT channel,
             CASE
               WHEN n = 1 THEN 1.0::DOUBLE
               WHEN n = 2 THEN 0.5::DOUBLE
               WHEN rn = 1 OR rn = n THEN 0.4::DOUBLE
               ELSE 0.2::DOUBLE / (n - 2)
             END AS credit
      FROM ranked
    )
    SELECT channel,
           COUNT(*) AS n_touches,
           CAST(CAST(SUM(CAST(CAST(credit AS VARCHAR) AS DECIMAL(30,12))) AS VARCHAR) AS DOUBLE)
             AS total_credit
    FROM credited GROUP BY channel
    """,
)
def event_position_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped (position-based) marketing attribution: every purchase
    distributes 1.0 credit over its view/click touches in the prior 7
    days — 40% first touch, 40% last, 20% spread over the middle
    (100%/50-50 for 1- and 2-touch journeys) — the standard model a
    step up from ``event_last_touch_attribution``.

    The touch join is equi on user_id with the 7-day band as a
    residual; per-conversion ranking windows are bounded by touches
    per user-week.  Per-touch credits are exact per-row doubles
    (rational weights, one division); the per-channel total is
    decimal-accumulated.
    """
    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("conv_ts"),
    )
    t = e.filter(F.col("event_type").isin("view", "click")).select(
        F.col("user_id").alias("t_user"),
        F.col("event_type").alias("channel"),
        "ts",
        "event_id",
    )
    touches = p.join(
        t,
        (F.col("t_user") == F.col("p_user"))
        & (F.col("ts") <= F.col("conv_ts"))
        & (F.col("ts") >= F.col("conv_ts") - F.expr("interval 7 days")),
    )
    w_rn = W.partitionBy("conv_id").orderBy("ts", "event_id")
    w_n = W.partitionBy("conv_id")
    ranked = touches.select(
        "conv_id",
        "channel",
        F.row_number().over(w_rn).alias("rn"),
        F.count(F.lit(1)).over(w_n).alias("n"),
    )
    credit = (
        F.when(F.col("n") == 1, F.lit(1.0))
        .when(F.col("n") == 2, F.lit(0.5))
        .when((F.col("rn") == 1) | (F.col("rn") == F.col("n")), F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("n") - 2))
    )
    return (
        ranked.select("channel", credit.alias("credit"))
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.sum(F.col("credit").cast("decimal(30,12)"))
            .cast("double")
            .alias("total_credit"),
        )
    )


@register(
    "ts_daily_anomaly",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n FROM events GROUP BY 1
    ),
    m AS (
      SELECT day, n,
             CAST(SUM(n) OVER w AS BIGINT) AS s1,
             CAST(SUM(n * n) OVER w AS BIGINT) AS s2,
             CAST(COUNT(*) OVER w AS BIGINT) AS c
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, n,
           CAST(s1 AS DOUBLE) / c AS mean7,
           sqrt(CAST(s2 AS DOUBLE) / c - (CAST(s1 AS DOUBLE) / c) * (CAST(s1 AS DOUBLE) / c))
             AS std7,
           CASE WHEN s2 * c > s1 * s1
                THEN abs(n - CAST(s1 AS DOUBLE) / c)
                     / sqrt(CAST(s2 AS DOUBLE) / c - (CAST(s1 AS DOUBLE) / c) * (CAST(s1 AS DOUBLE) / c))
                END AS z,
           COALESCE(CASE WHEN s2 * c > s1 * s1
                THEN abs(n - CAST(s1 AS DOUBLE) / c)
                     / sqrt(CAST(s2 AS DOUBLE) / c - (CAST(s1 AS DOUBLE) / c) * (CAST(s1 AS DOUBLE) / c))
                END > 2.0, FALSE) AS is_anomaly
    FROM m WHERE c >= 3
    """,
)
def ts_daily_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-volume anomaly detection: each day's event count compared
    to its trailing-7-day mean/σ (current day excluded), flagged when
    |z| > 2 — the ops-dashboard spike/drop detector.

    The windowed moments run over the DAILY table (calendar-sized —
    a bounded global window, the ``llm_vocab_topk`` class, not the RFM
    trap) and use integer sums (counts and squared counts are exact),
    so mean, σ and z are single per-row double expressions; days with
    zero trailing variance emit NULL z / FALSE.  Warm-up days (< 3
    trailing observations) are excluded.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = W.orderBy("day").rowsBetween(-7, -1)
    m = daily.select(
        "day",
        "n",
        F.sum("n").over(w).alias("s1"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("s2"),
        F.count(F.lit(1)).over(w).alias("c"),
    ).filter(F.col("c") >= 3)
    mean7 = F.col("s1").cast("double") / F.col("c")
    var7 = F.col("s2").cast("double") / F.col("c") - mean7 * mean7
    z = F.when(
        F.col("s2") * F.col("c") > F.col("s1") * F.col("s1"),
        F.abs(F.col("n") - mean7) / F.sqrt(var7),
    )
    return m.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n",
        mean7.alias("mean7"),
        F.sqrt(var7).alias("std7"),
        z.alias("z"),
        F.coalesce(z > 2.0, F.lit(False)).alias("is_anomaly"),
    )


@register(
    "sql_group_by_all",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n,
           CAST(CAST(SUM(CAST(CAST(o_totalprice AS VARCHAR) AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE)
             AS total
    FROM orders
    GROUP BY ALL
    """,
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`GROUP BY ALL` (Spark 4 + DuckDB both support it): group by
    every non-aggregate select item — the modern-SQL ergonomic that
    removes the copy-paste between SELECT and GROUP BY.  Plan is the
    ordinary map-combined hash aggregate.
    """

    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gba")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE) AS total
        FROM orders_gba
        GROUP BY ALL
        """
    )


@register(
    "q_abc_pareto_classification",
    oracle="""
    WITH rev AS (
      SELECT l_partkey,
             SUM(CAST(CAST(l_extendedprice * (1 - l_discount) AS VARCHAR)
                 AS DECIMAL(30,8))) AS dec_rev
      FROM lineitem GROUP BY l_partkey
    ),
    t AS (SELECT SUM(dec_rev) AS total FROM rev),
    c AS (
      SELECT l_partkey,
             CAST(CAST(dec_rev AS VARCHAR) AS DOUBLE) AS revenue,
             CAST(CAST(SUM(dec_rev) OVER (ORDER BY dec_rev DESC, l_partkey
                                          ROWS UNBOUNDED PRECEDING) AS VARCHAR) AS DOUBLE)
               / CAST(CAST(t.total AS VARCHAR) AS DOUBLE) AS cum_share
      FROM rev CROSS JOIN t
    )
    SELECT l_partkey, revenue, cum_share,
           CASE WHEN cum_share <= 0.8 THEN 'A'
                WHEN cum_share <= 0.95 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM c
    """,
)
def q_abc_pareto_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC/Pareto inventory classification: parts ranked by revenue,
    class A while the running revenue share is ≤ 80%, B to 95%, C
    beyond — the classic concentration cut for stocking policy.

    The running total over the revenue-ranked catalog is the global-
    cumsum shape; here it reuses :func:`_distributed_cumsum` over the
    EXACTLY-associative decimal revenue (range repartition +
    per-partition prefix + broadcast offsets — no single-task sort
    even for a billion-part catalog).  Shares and class cuts are
    per-row double arithmetic on identical decimals.
    """
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(30,8)"
            )
        ).alias("dec_rev")
    )
    # two-level distributed cumsum spelled inline in decimal arithmetic
    # (_distributed_cumsum casts its output to long — integers only).
    # r12: pin `local` and derive BOTH the per-partition totals and the
    # grand total from the pinned rows — the unpinned spelling ran the
    # lineitem revenue aggregate THREE times (t, local, totals) and the
    # range shuffle twice.  Exactness: decimal sums are associative, so
    # Σ_pid Σ_partition dec_rev == Σ dec_rev bit-for-bit, and the
    # window only appends _lcs (per-_pid sums are unchanged).  The
    # _distributed_cumsum / _grouped_ntile sibling fix, guide §5.
    from project_fauna_spark.cache import cached

    ranged = rev.repartitionByRange(
        F.col("dec_rev").desc(), F.col("l_partkey")
    ).withColumn("_pid", F.spark_partition_id())
    w_local = (
        W.partitionBy("_pid")
        .orderBy(F.col("dec_rev").desc(), F.col("l_partkey"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    local = cached(ranged.withColumn("_lcs", F.sum("dec_rev").over(w_local)))
    totals = local.groupBy("_pid").agg(F.sum("dec_rev").alias("_t"))
    t = totals.agg(F.sum("_t").alias("total"))
    prior = totals.select(F.col("_pid").alias("_pid2"), F.col("_t").alias("_t2"))
    offsets = (
        totals.join(F.broadcast(prior), F.col("_pid2") < F.col("_pid"), "left")
        .groupBy("_pid")
        .agg(F.sum("_t2").alias("_off"))
    )
    cum_share = (
        (F.col("_lcs") + F.coalesce(F.col("_off"), F.lit(0).cast("decimal(30,8)")))
        .cast("double")
        / F.col("total").cast("double")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .crossJoin(F.broadcast(t))
        .select(
            "l_partkey",
            F.col("dec_rev").cast("double").alias("revenue"),
            cum_share.alias("cum_share"),
            F.when(cum_share <= 0.8, "A")
            .when(cum_share <= 0.95, "B")
            .otherwise("C")
            .alias("abc_class"),
        )
    )


@register(
    "dq_uniqueness_audit",
    oracle="""
    SELECT 'o_orderkey' AS column_name, COUNT(*) AS n,
           COUNT(DISTINCT o_orderkey) AS n_distinct,
           COUNT(*) = COUNT(DISTINCT o_orderkey) AS is_unique
    FROM orders
    UNION ALL
    SELECT 'o_custkey', COUNT(*), COUNT(DISTINCT o_custkey),
           COUNT(*) = COUNT(DISTINCT o_custkey) FROM orders
    UNION ALL
    SELECT 'o_orderdate', COUNT(*), COUNT(DISTINCT o_orderdate),
           COUNT(*) = COUNT(DISTINCT o_orderdate) FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*), COUNT(DISTINCT o_orderstatus),
           COUNT(*) = COUNT(DISTINCT o_orderstatus) FROM orders
    """,
)
def dq_uniqueness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-key audit: per column, row count vs distinct count and
    a uniqueness verdict — the first check before declaring a primary
    key or a dedup key on an unfamiliar table.

    One pass per column of map-combined distinct aggregation (Spark
    expands multi-distinct into a single Expand + two-phase aggregate);
    output is 4 rows.
    """
    o = load_table(spark, sf_dir, "orders")
    rows = []
    for col in ["o_orderkey", "o_custkey", "o_orderdate", "o_orderstatus"]:
        rows.append(
            o.agg(
                F.lit(col).alias("column_name"),
                F.count(F.lit(1)).alias("n"),
                F.countDistinct(col).alias("n_distinct"),
                (F.count(F.lit(1)) == F.countDistinct(col)).alias("is_unique"),
            )
        )
    import functools as _ft

    return _ft.reduce(lambda a, b: a.unionAll(b), rows)


@register(
    "ts_seasonal_naive_backtest",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n FROM events GROUP BY 1
    ),
    j AS (
      SELECT a.day, a.n AS actual, b.n AS forecast,
             abs(a.n - b.n) AS abs_err
      FROM daily a JOIN daily b ON b.day = a.day - INTERVAL 7 DAY
    )
    SELECT COUNT(*) AS n_days,
           CAST(CAST(SUM(CAST(CAST(abs_err AS VARCHAR) AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE)
             / COUNT(*) AS mae,
           CAST(CAST(SUM(CAST(CAST(CAST(abs_err AS DOUBLE) / actual AS VARCHAR)
                              AS DECIMAL(30,12))) AS VARCHAR) AS DOUBLE)
             / COUNT(*) AS mape,
           CAST(MAX(abs_err) AS BIGINT) AS worst_abs_err
    FROM j
    """,
)
def ts_seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each day's event
    volume as the same weekday one week earlier and report MAE, MAPE
    and the worst absolute error — the baseline every forecasting
    model must beat, and the cheapest way to quantify weekly
    seasonality strength.

    Daily counts are one map-combined aggregate; the lag join is a
    self-join of the calendar-sized table on a shifted key. Errors
    are integers; MAE/MAPE are decimal-accumulated means of per-row
    exact values.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    a = daily.select(F.col("day"), F.col("n").alias("actual"))
    b = daily.select(
        F.date_add(F.col("day"), 7).alias("day"), F.col("n").alias("forecast")
    )
    j = a.join(b, "day").withColumn(
        "abs_err", F.abs(F.col("actual") - F.col("forecast"))
    )
    return j.agg(
        F.count(F.lit(1)).alias("n_days"),
        (
            F.sum(F.col("abs_err").cast("decimal(30,8)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mae"),
        (
            F.sum(
                (F.col("abs_err").cast("double") / F.col("actual")).cast(
                    "decimal(30,12)"
                )
            ).cast("double")
            / F.count(F.lit(1))
        ).alias("mape"),
        F.max("abs_err").cast("long").alias("worst_abs_err"),
    )


@register(
    "event_new_vs_returning",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, CAST(MIN(ts) AS DATE) AS first_day FROM events GROUP BY user_id
    ),
    active AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    )
    SELECT strftime(a.day, '%Y-%m-%d') AS day,
           CAST(SUM(CASE WHEN f.first_day = a.day THEN 1 ELSE 0 END) AS BIGINT)
             AS new_users,
           CAST(SUM(CASE WHEN f.first_day < a.day THEN 1 ELSE 0 END) AS BIGINT)
             AS returning_users
    FROM active a JOIN first_seen f USING (user_id)
    GROUP BY a.day
    """,
)
def event_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-vs-returning daily active users: each day's actives split by
    whether it is the user's first-ever day — the growth-accounting
    top line (acquisition vs retention).

    First-seen is one map-combined per-user aggregate joined back on
    user_id (the shuffle key both sides); the daily split is integer
    counting.
    """
    e = load_table(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.min("ts").cast("date").alias("first_day")
    )
    active = e.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    return (
        active.join(first_seen, "user_id")
        .groupBy(F.date_format("day", "yyyy-MM-dd").alias("day"))
        .agg(
            F.sum(F.when(F.col("first_day") == F.col("day"), 1).otherwise(0))
            .cast("long")
            .alias("new_users"),
            F.sum(F.when(F.col("first_day") < F.col("day"), 1).otherwise(0))
            .cast("long")
            .alias("returning_users"),
        )
    )


@register(
    "event_interarrival_stats",
    oracle="""
    WITH g AS (
      SELECT user_id,
             epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
                                                   ORDER BY ts, event_id)) AS gap_us
      FROM events
    )
    SELECT user_id,
           COUNT(gap_us) AS n_gaps,
           CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
           CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
           CAST(CAST(SUM(CAST(gap_us AS DECIMAL(30,0))) AS VARCHAR) AS DOUBLE)
             / COUNT(gap_us) AS mean_gap_us
    FROM g WHERE gap_us IS NOT NULL
    GROUP BY user_id
    """,
)
def event_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival statistics: min/max/mean microsecond gap
    between consecutive events — the activity-cadence profile behind
    session-gap tuning and bot detection.

    One user_id-keyed window for the lag, one map-combined aggregate;
    gaps are integer microseconds (no float until the mean's edge,
    which is an exact decimal sum over integers).
    """
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    g = e.withColumn("gap_us", gap).filter(F.col("gap_us").isNotNull())
    return g.groupBy("user_id").agg(
        F.count("gap_us").alias("n_gaps"),
        F.min("gap_us").cast("long").alias("min_gap_us"),
        F.max("gap_us").cast("long").alias("max_gap_us"),
        (
            F.sum(F.col("gap_us").cast("decimal(30,0)")).cast("double")
            / F.count("gap_us")
        ).alias("mean_gap_us"),
    )
