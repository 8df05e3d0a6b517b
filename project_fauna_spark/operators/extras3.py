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

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from project_fauna_spark.io import load_table
from project_fauna_spark.operators._oracle_shared import SQL_TS_FMT_US, TS_FMT_US
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
