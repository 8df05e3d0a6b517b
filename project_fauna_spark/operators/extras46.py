"""Round-6 batch 40: vocabulary coverage curve and fold-based period
detection.

Registered AFTER the round-6 grading window block (plans/__init__) —
new registrations must never perturb the first-50 window the driver
grades (pinned by tests/test_window_manifest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from project_fauna_spark.cache import cached
from project_fauna_spark.io import load_table
from project_fauna_spark.plans.registry import register

# --------------------------------------------------------------------------
# text_vocab_coverage_curve — how big a vocabulary do we actually need?
# --------------------------------------------------------------------------

_VOCAB_CUTS = [100, 1000, 10000]


@register(
    "text_vocab_coverage_curve",
    oracle=f"""
    WITH tc AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
      GROUP BY term
    ),
    r AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, term) AS rk FROM tc
    ),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_tokens,
                   CAST(COUNT(*) AS BIGINT) AS n_vocab
            FROM tc)
    SELECT k.k AS vocab_size,
           tot.n_vocab, tot.n_tokens,
           CAST(COALESCE(SUM(r.c) FILTER (WHERE r.rk <= k.k), 0) AS BIGINT)
             AS tokens_covered,
           CAST(COALESCE(SUM(r.c) FILTER (WHERE r.rk <= k.k), 0) AS DOUBLE)
             / CAST(tot.n_tokens AS DOUBLE) AS coverage
    FROM (SELECT unnest([{", ".join(map(str, _VOCAB_CUTS))}]) AS k) k,
         tot, r
    GROUP BY k.k, tot.n_vocab, tot.n_tokens
    """,
)
def text_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: what share of all token occurrences
    the top-100 / top-1 000 / top-10 000 most frequent terms cover —
    the Zipf-tail readout that sizes a tokenizer's vocab and predicts
    the OOV rate of any cut (``llm_vocab_topk`` lists the head terms;
    ``llm_oov_rate`` scores ONE fixed vocab; this is the whole
    size-vs-coverage CURVE).

    Exact: term counts rank under a total (count DESC, term) order;
    each coverage value is one IEEE division of exact integer sums.
    Scale: the rank window runs on the AGGREGATED vocabulary (already
    1000× smaller than the token stream); a web-scale vocabulary
    would two-phase the rank through count-band buckets exactly like
    ``ranks.bucket_offsets`` — the raw token stream only ever sees
    the one map-combined count aggregate.
    """
    tc = cached(
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("c"))
    )
    r = tc.select(
        "c",
        F.row_number()
        .over(W.orderBy(F.col("c").desc(), "term"))
        .alias("rk"),
    )
    tot = tc.agg(
        F.sum("c").alias("n_tokens"), F.count("*").alias("n_vocab")
    )
    ks = spark.createDataFrame([(k,) for k in _VOCAB_CUTS], "k long")
    covered = F.coalesce(
        F.sum(F.when(F.col("rk") <= F.col("k"), F.col("c"))), F.lit(0)
    )
    return (
        r.crossJoin(F.broadcast(ks))
        .crossJoin(F.broadcast(tot))
        .groupBy("k", "n_vocab", "n_tokens")
        .agg(covered.alias("tokens_covered"))
        .select(
            F.col("k").alias("vocab_size"),
            "n_vocab",
            "n_tokens",
            F.col("tokens_covered").cast("long").alias("tokens_covered"),
            (
                F.col("tokens_covered").cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("coverage"),
        )
    )


# --------------------------------------------------------------------------
# ts_period_scan — which cycle length explains the traffic?
# --------------------------------------------------------------------------

_PERIODS = list(range(2, 15))  # candidate cycle lengths (days)


@register(
    "ts_period_scan",
    # For each candidate period p the series (dense day ranks of the
    # OBSERVED days) truncates to m = ⌊N/p⌋ full cycles so every phase
    # has exactly m points; the between-phase variance share is then
    # R² = (p·Σ_φ S_φ² − T²) / (N'·Σx² − T²) with N' = p·m — an
    # ALL-integer numerator and denominator and ONE IEEE division, so
    # the argmax over 13 such doubles is deterministic cross-engine.
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    rk AS (
      SELECT y, row_number() OVER (ORDER BY day) - 1 AS r,
             COUNT(*) OVER () AS nd
      FROM daily
    ),
    px AS (
      SELECT p.p, rk.y, rk.r % p.p AS phase, (rk.nd // p.p) AS m
      FROM rk, (SELECT unnest([{", ".join(map(str, _PERIODS))}]) AS p) p
      WHERE rk.r < p.p * (rk.nd // p.p)
    ),
    ph AS (
      SELECT p, phase, m,
             CAST(SUM(y) AS HUGEINT) AS s,
             CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS ss
      FROM px GROUP BY 1, 2, 3
    ),
    per AS (
      SELECT p, CAST(MAX(m) AS BIGINT) AS m,
             CAST(p * MAX(m) AS BIGINT) AS n_used,
             SUM(s) AS t, SUM(ss) AS ssx, SUM(s * s) AS s2
      FROM ph GROUP BY p
    ),
    scored AS (
      SELECT p AS period, m AS folds, n_used,
             CASE WHEN n_used * ssx - t * t > 0
                  THEN CAST(CAST(p * s2 - t * t AS VARCHAR) AS DOUBLE)
                       / CAST(CAST(n_used * ssx - t * t AS VARCHAR) AS DOUBLE)
             END AS between_r2
      FROM per
    ),
    -- zero-fold periods (series shorter than p) still emit a row:
    -- the scan contract is ALL of 2..14, NULL when unanswerable
    spine AS (SELECT unnest([2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14]) AS period)
    SELECT sp.period,
           COALESCE(sc.folds, 0) AS folds,
           COALESCE(sc.n_used, 0) AS n_used,
           sc.between_r2,
           sc.between_r2 IS NOT NULL AND
           struct_pack(v := sc.between_r2, np := -sp.period) =
             (SELECT MAX(struct_pack(v := between_r2, np := -period))
              FROM scored WHERE between_r2 IS NOT NULL) AS is_best
    FROM spine sp LEFT JOIN scored sc ON sc.period = sp.period
    """,
)
def ts_period_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Periodogram-free seasonality scan: for every candidate cycle
    length p ∈ 2..14 days, fold the daily-count series into p phases
    (truncated to whole cycles so phases are balanced) and score the
    share of variance the phase means explain — the period whose fold
    lines the data up best wins (``ts_acf_daily`` probes FIXED lags;
    this scans the whole candidate range and flags the argmax, the
    automated version of "is it weekly?").

    All moments are exact integers; each R² is one IEEE division of
    exact integers (VARCHAR-routed decimal edges), and the winner is
    a lexicographic struct argmax on (R², −period) — smallest period
    wins ties, deterministically.  Scale: one map-combined daily
    aggregate; the fold/score frames are (periods × phases)-sized.
    """
    daily = (
        load_table(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("day"))
        .groupBy("day")
        .agg(F.count("*").alias("y"))
    )
    rk = daily.select(
        "y",
        (F.row_number().over(W.orderBy("day")) - 1).alias("r"),
        F.count("*").over(W.partitionBy()).alias("nd"),
    )
    ps = spark.createDataFrame([(p,) for p in _PERIODS], "p long")
    px = (
        rk.crossJoin(F.broadcast(ps))
        .withColumn("m", F.expr("nd DIV p"))
        .filter(F.col("r") < F.col("p") * F.col("m"))
        .select("p", "y", (F.col("r") % F.col("p")).alias("phase"), "m")
    )
    dy = F.col("y").cast("decimal(19,0)")
    ph = px.groupBy("p", "phase", "m").agg(
        F.sum(dy).alias("s"), F.sum(dy * dy).alias("ss")
    )
    per = ph.groupBy("p").agg(
        F.max("m").cast("long").alias("folds"),
        (F.col("p") * F.max("m")).cast("long").alias("n_used"),
        F.sum("s").alias("t"),
        F.sum("ss").alias("ssx"),
        F.sum(F.col("s").cast("decimal(38,0)") * F.col("s")).alias("s2"),
    )
    t = F.col("t").cast("decimal(38,0)")
    num = F.col("p").cast("decimal(38,0)") * F.col("s2") - t * t
    den = F.col("n_used").cast("decimal(38,0)") * F.col("ssx") - t * t
    scored = cached(
        ps.select(F.col("p").alias("period"))
        .join(
            per.select(
                F.col("p").alias("period"),
                "folds",
                "n_used",
                F.when(den > 0, num.cast("double") / den.cast("double")).alias(
                    "between_r2"
                ),
            ),
            "period",
            "left",
        )
        .select(
            "period",
            F.coalesce(F.col("folds"), F.lit(0)).cast("long").alias("folds"),
            F.coalesce(F.col("n_used"), F.lit(0)).cast("long").alias("n_used"),
            "between_r2",
        )
    )
    best = scored.filter(F.col("between_r2").isNotNull()).agg(
        F.max(
            F.struct(
                F.col("between_r2").alias("v"),
                (-F.col("period")).alias("np"),
            )
        ).alias("b")
    )
    return scored.crossJoin(F.broadcast(best)).select(
        "period",
        "folds",
        "n_used",
        "between_r2",
        (
            F.col("between_r2").isNotNull()
            & (F.col("between_r2") == F.col("b.v"))
            & (-F.col("period") == F.col("b.np"))
        ).alias("is_best"),
    )
