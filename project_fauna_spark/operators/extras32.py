"""Round-6 batch 26: cross-language vocabulary drift and the
weighted-vs-unweighted mean paradox.

Registered AFTER the round-6 grading window block (plans/__init__) —
new registrations must never perturb the first-50 window the driver
grades (pinned by tests/test_window_manifest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from project_fauna_spark.cache import cached
from project_fauna_spark.io import load_table
from project_fauna_spark.plans.registry import dsum, register, sql_dsum

# --------------------------------------------------------------------------
# text_tvd_language_drift — how far apart are two corpora's vocabularies?
# --------------------------------------------------------------------------


@register(
    "text_tvd_language_drift",
    oracle="""
    WITH tok AS (
      SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tc AS (SELECT lang, term, CAST(COUNT(*) AS BIGINT) AS c
           FROM tok GROUP BY 1, 2),
    n AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS nt FROM tc GROUP BY 1),
    pairs AS (
      SELECT a.lang AS lang_a, b.lang AS lang_b, a.nt AS na, b.nt AS nb
      FROM n a JOIN n b ON a.lang < b.lang
    ),
    bo AS (
      SELECT a.lang AS la, b.lang AS lb,
             CAST(COUNT(*) AS BIGINT) AS n_common,
             CAST(SUM(ABS(a.c * nb.nt - b.c * na.nt)) AS BIGINT) AS s_abs,
             CAST(SUM(a.c) AS BIGINT) AS ca,
             CAST(SUM(b.c) AS BIGINT) AS cb
      FROM tc a
      JOIN tc b ON a.term = b.term AND a.lang < b.lang
      JOIN n na ON na.lang = a.lang
      JOIN n nb ON nb.lang = b.lang
      GROUP BY 1, 2
    )
    SELECT p.lang_a, p.lang_b, p.na AS tokens_a, p.nb AS tokens_b,
           COALESCE(bo.n_common, 0) AS n_common_terms,
           CAST(COALESCE(bo.s_abs, 0)
                + (p.na - COALESCE(bo.ca, 0)) * p.nb
                + (p.nb - COALESCE(bo.cb, 0)) * p.na AS DOUBLE)
             / CAST(2 * p.na * p.nb AS DOUBLE) AS tvd
    FROM pairs p LEFT JOIN bo ON bo.la = p.lang_a AND bo.lb = p.lang_b
    """,
)
def text_tvd_language_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT total-variation distance between every pair of languages'
    unigram term distributions: TVD = ½ Σ_t |p_a(t) − p_b(t)| ∈ [0, 1]
    — the bin-free, log-free distribution distance (the drift test
    PSI/KL approximate, without their binning or log-of-zero
    problems).  0 = identical vocabularies, 1 = fully disjoint.

    Log-free exactness: with integer counts c and totals N,
    ½ Σ |c_a/N_a − c_b/N_b| = Σ |c_a·N_b − c_b·N_a| / (2·N_a·N_b) —
    ALL-integer numerator, ONE IEEE division at the edge.  Terms
    present in only one language never enter the join: their
    contribution is (N_a − Σ_common c_a)·N_b + symmetric, derived
    from the common-term sums — so the pair join touches ONLY the
    vocabulary intersection (inverted-index equi join on term), never
    a full outer union.  Scale: one token aggregate, one term-keyed
    self-join, |langs|²-sized everything after; at 100 TB the integer
    numerator accumulates in decimal(38,0) instead of BIGINT.
    """
    tok = load_table(spark, sf_dir, "documents").select(
        "lang", F.explode(F.split("text", " ")).alias("term")
    )
    tc = cached(tok.groupBy("lang", "term").agg(F.count("*").alias("c")))
    n = tc.groupBy("lang").agg(F.sum("c").alias("nt"))
    a = tc.select(F.col("lang").alias("la"), "term", F.col("c").alias("cxa"))
    b = tc.select(F.col("lang").alias("lb"), "term", F.col("c").alias("cxb"))
    bo = (
        a.join(b, "term")
        .filter(F.col("la") < F.col("lb"))
        .join(F.broadcast(n.select(F.col("lang").alias("la"), F.col("nt").alias("na"))), "la")
        .join(F.broadcast(n.select(F.col("lang").alias("lb"), F.col("nt").alias("nb"))), "lb")
        .groupBy("la", "lb")
        .agg(
            F.count("*").alias("n_common"),
            F.sum(F.abs(F.col("cxa") * F.col("nb") - F.col("cxb") * F.col("na"))).alias(
                "s_abs"
            ),
            F.sum("cxa").alias("ca"),
            F.sum("cxb").alias("cb"),
        )
    )
    pairs = (
        n.select(F.col("lang").alias("lang_a"), F.col("nt").alias("na"))
        .join(
            F.broadcast(
                n.select(F.col("lang").alias("lang_b"), F.col("nt").alias("nb"))
            ),
            F.col("lang_a") < F.col("lang_b"),
        )
    )
    num = (
        F.coalesce(F.col("s_abs"), F.lit(0))
        + (F.col("na") - F.coalesce(F.col("ca"), F.lit(0))) * F.col("nb")
        + (F.col("nb") - F.coalesce(F.col("cb"), F.lit(0))) * F.col("na")
    )
    return (
        pairs.join(
            F.broadcast(bo),
            (F.col("lang_a") == F.col("la")) & (F.col("lang_b") == F.col("lb")),
            "left",
        )
        .select(
            "lang_a",
            "lang_b",
            F.col("na").alias("tokens_a"),
            F.col("nb").alias("tokens_b"),
            F.coalesce(F.col("n_common"), F.lit(0)).cast("long").alias("n_common_terms"),
            (
                num.cast("double")
                / (F.lit(2) * F.col("na") * F.col("nb")).cast("double")
            ).alias("tvd"),
        )
    )


# --------------------------------------------------------------------------
# agg_ratio_paradox_discount — weighted vs unweighted means disagree
# --------------------------------------------------------------------------


@register(
    "agg_ratio_paradox_discount",
    oracle=f"""
    SELECT c_mktsegment, n_lines, wavg_discount, avg_discount,
           wavg_discount - avg_discount AS weighting_gap
    FROM (
      SELECT c.c_mktsegment,
             CAST(COUNT(*) AS BIGINT) AS n_lines,
             {sql_dsum('l.l_discount * l.l_extendedprice', 30, 8)}
               / {sql_dsum('l.l_extendedprice', 30, 8)} AS wavg_discount,
             {sql_dsum('l.l_discount', 30, 8)} / COUNT(*) AS avg_discount
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1
    )
    """,
)
def agg_ratio_paradox_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-of-sums vs average-of-ratios per market segment: the
    revenue-weighted mean discount (Σ d·price / Σ price — what the
    finance ledger experiences) against the unweighted per-line mean
    (what a naive AVG(discount) dashboard reports), and their gap —
    positive when big-ticket lines get deeper discounts.  The classic
    aggregation-bias / Simpson's-paradox audit every metrics layer
    needs before anyone trusts an "average rate".

    Both numerators and denominators accumulate in exact decimal
    (VARCHAR-routed at the oracle's cast edges); each mean is ONE
    IEEE division, and the gap is one subtraction of the two —
    deterministic because both operands are already bit-equal.
    Scale: lineitem⋈orders is orderkey-colocatable, customer joins
    broadcast, then a 5-key aggregate.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_discount", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    agg = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_lines"),
            (
                dsum(F.col("l_discount") * F.col("l_extendedprice"))
                / dsum(F.col("l_extendedprice"))
            ).alias("wavg_discount"),
            (dsum(F.col("l_discount")) / F.count("*")).alias("avg_discount"),
        )
    )
    return agg.select(
        "c_mktsegment",
        "n_lines",
        "wavg_discount",
        "avg_discount",
        (F.col("wavg_discount") - F.col("avg_discount")).alias("weighting_gap"),
    )
