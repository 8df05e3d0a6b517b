"""Round-6 batch 9: collocation mining, a Pareto-skyline query, and
winsorized/trimmed robust means.

Registered AFTER the round-6 grading window block (plans/__init__) —
new registrations must never perturb the first-50 window the driver
grades (pinned by tests/test_window_manifest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from project_fauna_spark.cache import cached
from project_fauna_spark.functions.ranks import bucket_offsets
from project_fauna_spark.functions.shingles import word_bigrams
from project_fauna_spark.io import load_table
from project_fauna_spark.plans.registry import register, davg, sql_davg

# --------------------------------------------------------------------------
# text_pmi_collocations — corpus collocations ranked by lift (≡ PMI order)
# --------------------------------------------------------------------------

_PMI_MIN_COUNT = 5
_PMI_TOP_K = 25


@register(
    "text_pmi_collocations",
    oracle=f"""
    WITH pr AS (
      SELECT unnest([ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]) AS pair
      FROM (SELECT string_split(text, ' ') AS ws FROM documents)
    ),
    ab AS (SELECT pair, COUNT(*) AS n_ab FROM pr GROUP BY pair),
    a AS (SELECT split_part(pair, ' ', 1) AS w1, COUNT(*) AS n_a
          FROM pr GROUP BY 1),
    b AS (SELECT split_part(pair, ' ', 2) AS w2, COUNT(*) AS n_b
          FROM pr GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_total FROM pr)
    SELECT ab.pair,
           CAST(ab.n_ab AS BIGINT) AS n_ab,
           CAST(a.n_a AS BIGINT) AS n_a,
           CAST(b.n_b AS BIGINT) AS n_b,
           (CAST(ab.n_ab AS DOUBLE) * CAST(n.n_total AS DOUBLE))
             / (CAST(a.n_a AS DOUBLE) * CAST(b.n_b AS DOUBLE)) AS lift
    FROM ab
    JOIN a ON a.w1 = split_part(ab.pair, ' ', 1)
    JOIN b ON b.w2 = split_part(ab.pair, ' ', 2)
    CROSS JOIN n
    WHERE ab.n_ab >= {_PMI_MIN_COUNT}
    ORDER BY lift DESC, ab.pair
    LIMIT {_PMI_TOP_K}
    """,
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: the top-{25} word bigrams by lift
    ``n_ab·N / (n_a·n_b)`` — monotone in PMI (log is increasing), so
    this ranks exactly as pointwise mutual information without putting
    a cross-engine ``log`` at the compared edge.  The phrases this
    surfaces ("et al", "New York") are what a tokenizer-vocab or
    stop-phrase list builder consumes.

    One bigram explode (the ``word_bigrams`` zipped-slice shape — the
    lambda touches only its element) is map-side-combined straight into
    the distinct-bigram count table; BOTH marginals and the grand total
    are derived from that table by summation (Σ_b n_ab = n_a exactly),
    so the persisted multi-consumer state is distinct-bigram-sized —
    vocabulary², not corpus-sized.  Counts are exact integers and the
    lift is a fixed-shape product/quotient of exact-integer-valued
    doubles, IEEE-identical across engines.  Min-support {5} is applied
    AFTER the marginals (they must count the full table), and the top-k
    edge is sort+limit (TakeOrdered — no global window).  Scale: one
    token-keyed hash aggregate; marginal join keys are words (bounded
    vocabulary → broadcast-sized at any corpus scale).
    """
    d = load_table(spark, sf_dir, "documents").select("text")
    pairs = d.select(F.explode(word_bigrams(F.col("text"))).alias("pair"))
    # group by the bare pair (w1/w2 are pure functions of it — deriving
    # them BEFORE the aggregate would double every shuffled row's width
    # through the corpus-sized explode); split on the vocab²-sized
    # distinct table instead.
    ab_full = cached(
        pairs.groupBy("pair")
        .agg(F.count("*").alias("n_ab"))
        .select(
            "pair",
            F.split(F.col("pair"), " ").getItem(0).alias("w1"),
            F.split(F.col("pair"), " ").getItem(1).alias("w2"),
            "n_ab",
        )
    )
    ab = ab_full.filter(F.col("n_ab") >= _PMI_MIN_COUNT)
    a = ab_full.groupBy("w1").agg(F.sum("n_ab").alias("n_a"))
    b = ab_full.groupBy("w2").agg(F.sum("n_ab").alias("n_b"))
    n = ab_full.agg(F.sum("n_ab").alias("n_total"))
    lift = (F.col("n_ab").cast("double") * F.col("n_total").cast("double")) / (
        F.col("n_a").cast("double") * F.col("n_b").cast("double")
    )
    return (
        ab.join(F.broadcast(a), "w1")
        .join(F.broadcast(b), "w2")
        .crossJoin(F.broadcast(n))
        .select(
            "pair",
            F.col("n_ab").cast("long").alias("n_ab"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            lift.alias("lift"),
        )
        .orderBy(F.col("lift").desc(), F.col("pair"))
        .limit(_PMI_TOP_K)
    )


# --------------------------------------------------------------------------
# q_pareto_skyline — 2-D dominance frontier (cheapest part per capacity)
# --------------------------------------------------------------------------


@register(
    "q_pareto_skyline",
    oracle="""
    WITH per_p AS (
      SELECT p_retailprice AS price, MAX(p_size) AS max_size
      FROM part GROUP BY p_retailprice
    ),
    run AS (
      SELECT price, max_size,
             MAX(max_size) OVER (ORDER BY price
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
      FROM per_p
    )
    SELECT p.p_partkey, p.p_retailprice, p.p_size
    FROM part p JOIN run r ON r.price = p.p_retailprice
    WHERE p.p_size = r.max_size
      AND (r.prev_max IS NULL OR r.max_size > r.prev_max)
    """,
)
def q_pareto_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto-frontier) query over parts: minimize
    ``p_retailprice`` while maximizing ``p_size`` — a part survives iff
    no other part is at-most-as-expensive AND at-least-as-large with
    one strict inequality.  The classic multi-criteria shortlist
    operator (Börzsönyi et al., ICDE 2001) that SQL engines spell as a
    window, here de-funneled for scale.

    Reduction: group to one row per distinct price with the max size at
    that price; a price is on the frontier iff its max size strictly
    exceeds the running max over all strictly-cheaper prices (row-frame
    excluding current works because the grouped table has unique
    prices); frontier member rows are the parts matching (price,
    max_size).  The running max runs TWO-PHASE: a local window inside
    price buckets (floor(price/256) — the window always carries its
    bucket key) plus a broadcast per-bucket prefix-max table, so no
    single task ever sees the whole price domain.  No arithmetic
    touches the compared columns — pure comparisons, so double parity
    is trivial.  Scale: one price-keyed aggregate, bucket-local
    windows, and a broadcast of the (tiny) frontier price set.
    """
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    per_p = (
        part.groupBy("p_retailprice")
        .agg(F.max("p_size").alias("max_size"))
        .withColumn(
            "bkt", F.floor(F.col("p_retailprice") / F.lit(256.0)).cast("long")
        )
    )
    local_prev = F.max("max_size").over(
        W.partitionBy("bkt")
        .orderBy("p_retailprice")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    bmax = per_p.groupBy("bkt").agg(F.max("max_size").alias("_bmax"))
    bprev = bmax.select(
        "bkt",
        F.max("_bmax")
        .over(W.partitionBy().orderBy("bkt").rowsBetween(W.unboundedPreceding, -1))
        .alias("bucket_prev"),
    )
    # greatest() skips NULLs (null only when BOTH are null — the global
    # head row), so no sentinel value is assumed for the p_size domain.
    prev_eff = F.greatest(local_prev, F.col("bucket_prev"))
    frontier = (
        per_p.join(F.broadcast(bprev), "bkt")
        .withColumn("_prev", prev_eff)
        .filter(F.col("_prev").isNull() | (F.col("max_size") > F.col("_prev")))
        .select("p_retailprice", "max_size")
    )
    return (
        part.join(F.broadcast(frontier), "p_retailprice")
        .filter(F.col("p_size") == F.col("max_size"))
        .select("p_partkey", "p_retailprice", "p_size")
    )


# --------------------------------------------------------------------------
# agg_winsorized_trimmed_mean — robust location via exact p05/p95 cuts
# --------------------------------------------------------------------------


@register(
    "agg_winsorized_trimmed_mean",
    oracle=f"""
    WITH t AS (SELECT l_extendedprice AS x FROM lineitem),
    n AS (SELECT COUNT(*) AS n FROM t),
    k AS (SELECT n, (n + 19) // 20 AS k_lo, (19 * n) // 20 AS k_hi FROM n),
    ranked AS (SELECT x, ROW_NUMBER() OVER (ORDER BY x) AS r FROM t),
    cuts AS (
      SELECT (SELECT x FROM ranked, k WHERE r = k_lo) AS lo_cut,
             (SELECT x FROM ranked, k WHERE r = k_hi) AS hi_cut
    )
    SELECT CAST(k.n AS BIGINT) AS n_rows,
           c.lo_cut, c.hi_cut,
           {sql_davg('t.x')} AS mean_raw,
           {sql_davg('least(greatest(t.x, c.lo_cut), c.hi_cut)')} AS mean_winsor,
           {sql_davg('CASE WHEN t.x BETWEEN c.lo_cut AND c.hi_cut '
                      'THEN t.x END')} AS mean_trimmed
    FROM t CROSS JOIN cuts c CROSS JOIN k
    GROUP BY k.n, c.lo_cut, c.hi_cut
    """,
)
def agg_winsorized_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust location estimates of ``l_extendedprice``: the raw mean,
    the 5–95 % WINSORIZED mean (tails clamped to the cut values) and
    the 5–95 % TRIMMED mean (tails dropped) — the outlier-resistant
    aggregates a metrics pipeline publishes when raw means are
    leverage-prone.

    The cut values are EXACT order statistics, not sketches: cut ranks
    are pure-integer ``⌈n/20⌉`` / ``⌊19n/20⌋`` (never ``0.05·n`` in
    floating point, whose ulp error flips a ceil at multiples of 20),
    and the value at a rank is selected by the repo's two-phase
    bucketed row_number (bucket = floor(x/4096); raw-data windows carry
    their bucket key — never a single-partition global sort) with
    straddling-bucket pruning: the broadcast offset table identifies
    the ≤2 buckets that can contain a cut rank and every other bucket
    skips the sort entirely.  Ties in
    ``x`` make the tie-broken rank choice irrelevant: position k holds
    the same value under any tie order, which is why the oracle's
    single-window ROW_NUMBER agrees bit-for-bit.  All three means are
    decimal-accumulated (``davg``) with the clamp/trim applied inside
    the aggregate.  Scale: one bucket-keyed shuffle for the ranks, one
    broadcast of the 1-row cut table, one map-combined aggregate.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("x")
    )
    # b feeds the offset aggregate, the straddling-bucket counts, the
    # rank join AND the final mean pass — persist the 1-column
    # projection so the parquet scan runs once, not four times.
    b = cached(
        li.withColumn("bkt", F.floor(F.col("x") / F.lit(4096.0)).cast("long"))
    )
    offs = bucket_offsets(
        b, [], "bkt", F.lit(1), total_alias="n_total", bucket_total_alias="bn"
    )
    # Order-statistic PRUNING: only the (≤2) buckets whose [offset,
    # offset+bn] interval straddles a cut rank need sorting at all —
    # every other bucket is filtered out BEFORE the rank window, so
    # the windowed sort touches ~1/n_buckets of the data.  bn comes
    # free from the offsets aggregate — no second groupBy pass.
    sel = (
        offs
        .withColumn("k_lo", F.expr("(n_total + 19) div 20"))
        .withColumn("k_hi", F.expr("(19 * n_total) div 20"))
        .filter(
            (
                (F.col("k_lo") > F.col("offset"))
                & (F.col("k_lo") <= F.col("offset") + F.col("bn"))
            )
            | (
                (F.col("k_hi") > F.col("offset"))
                & (F.col("k_hi") <= F.col("offset") + F.col("bn"))
            )
        )
    )
    local_rn = F.row_number().over(W.partitionBy("bkt").orderBy("x"))
    ranked = b.join(F.broadcast(sel), "bkt").withColumn(
        "r", (F.col("offset") + local_rn).cast("long")
    )
    cuts = (
        ranked.filter(
            (F.col("r") == F.col("k_lo")) | (F.col("r") == F.col("k_hi"))
        )
        .agg(
            F.max(F.when(F.col("r") == F.col("k_lo"), F.col("x"))).alias(
                "lo_cut"
            ),
            F.max(F.when(F.col("r") == F.col("k_hi"), F.col("x"))).alias(
                "hi_cut"
            ),
            F.max("n_total").alias("n_rows"),
        )
    )
    base = b.select("x").crossJoin(F.broadcast(cuts))
    clamped = F.least(F.greatest(F.col("x"), F.col("lo_cut")), F.col("hi_cut"))
    kept = F.when(
        (F.col("x") >= F.col("lo_cut")) & (F.col("x") <= F.col("hi_cut")),
        F.col("x"),
    )
    return base.groupBy("n_rows", "lo_cut", "hi_cut").agg(
        davg(F.col("x")).alias("mean_raw"),
        davg(clamped).alias("mean_winsor"),
        davg(kept).alias("mean_trimmed"),
    ).select(
        F.col("n_rows").cast("long").alias("n_rows"),
        "lo_cut",
        "hi_cut",
        "mean_raw",
        "mean_winsor",
        "mean_trimmed",
    )
