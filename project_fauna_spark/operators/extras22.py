"""Round-6 batch 16: a procurement substitute finder and a join-fanout
cardinality profile.

Registered AFTER the round-6 grading window block (plans/__init__) —
new registrations must never perturb the first-50 window the driver
grades (pinned by tests/test_window_manifest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from project_fauna_spark.cache import cached
from project_fauna_spark.io import load_table
from project_fauna_spark.plans.registry import register

# --------------------------------------------------------------------------
# q_part_substitution_candidates — cheapest interchangeable part
# --------------------------------------------------------------------------

_SUB_TOP_K = 25


@register(
    "q_part_substitution_candidates",
    oracle=f"""
    WITH p AS (
      SELECT p_partkey, p_type, p_size, p_retailprice FROM part
    ),
    m1 AS (
      SELECT p_type, p_size,
             MIN(struct_pack(pr := p_retailprice, k := p_partkey)) AS b1
      FROM p GROUP BY p_type, p_size
    ),
    m2 AS (
      SELECT p.p_type, p.p_size,
             MIN(struct_pack(pr := p.p_retailprice, k := p.p_partkey)) AS b2
      FROM p JOIN m1 ON m1.p_type = p.p_type AND m1.p_size = p.p_size
      WHERE struct_pack(pr := p.p_retailprice, k := p.p_partkey) > m1.b1
      GROUP BY p.p_type, p.p_size
    ),
    alt AS (
      SELECT p.p_partkey, p.p_type, p.p_size, p.p_retailprice,
             CASE WHEN m1.b1.k <> p.p_partkey THEN m1.b1 ELSE m2.b2 END AS a
      FROM p
      JOIN m1 ON m1.p_type = p.p_type AND m1.p_size = p.p_size
      LEFT JOIN m2 ON m2.p_type = p.p_type AND m2.p_size = p.p_size
    )
    SELECT p_partkey, p_type, p_size, p_retailprice,
           a.k AS alt_partkey,
           a.pr AS alt_price,
           p_retailprice - a.pr AS savings
    FROM alt
    WHERE a.k IS NOT NULL AND p_retailprice - a.pr > 0
    ORDER BY savings DESC, p_partkey
    LIMIT {_SUB_TOP_K}
    """,
)
def q_part_substitution_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Procurement substitute finder: for every part, the CHEAPEST
    OTHER part of the same (type, size) — interchangeable by spec —
    and the top-{25} overpriced parts by potential savings.  The
    "why are we buying this one?" report.

    Needs the per-group minimum AND runner-up (a part that is itself
    the cheapest must fall back to the second-cheapest): both come
    from keyed AGGREGATES over (type, size) — a struct-min pass, then
    a struct-min over the rows strictly above it — never a per-group
    sort window, so group size never concentrates in one task.  The
    (price, partkey) struct key makes every argmin deterministic
    under price ties in both engines; savings is one subtraction of
    raw doubles and the edge is sort+limit (TakeOrdered).  Scale: two
    map-combined aggregates + broadcast joins of the group-count-sized
    minima tables.
    """
    p = cached(
        load_table(spark, sf_dir, "part").select(
            "p_partkey", "p_type", "p_size", "p_retailprice"
        )
    )
    key = F.struct(
        F.col("p_retailprice").alias("pr"), F.col("p_partkey").alias("k")
    )
    m1 = p.groupBy("p_type", "p_size").agg(F.min(key).alias("b1"))
    m2 = (
        p.join(F.broadcast(m1), ["p_type", "p_size"])
        .filter(key > F.col("b1"))
        .groupBy("p_type", "p_size")
        .agg(F.min(key).alias("b2"))
    )
    alt = F.when(
        F.col("b1.k") != F.col("p_partkey"), F.col("b1")
    ).otherwise(F.col("b2"))
    return (
        p.join(F.broadcast(m1), ["p_type", "p_size"])
        .join(F.broadcast(m2), ["p_type", "p_size"], "left")
        .withColumn("a", alt)
        .filter(
            F.col("a.k").isNotNull()
            & (F.col("p_retailprice") - F.col("a.pr") > 0)
        )
        .select(
            "p_partkey",
            "p_type",
            "p_size",
            "p_retailprice",
            F.col("a.k").alias("alt_partkey"),
            F.col("a.pr").alias("alt_price"),
            (F.col("p_retailprice") - F.col("a.pr")).alias("savings"),
        )
        .orderBy(F.col("savings").desc(), "p_partkey")
        .limit(_SUB_TOP_K)
    )


# --------------------------------------------------------------------------
# dq_join_fanout_profile — orders⋈lineitem cardinality histogram
# --------------------------------------------------------------------------


@register(
    "dq_join_fanout_profile",
    oracle="""
    WITH lc AS (
      SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS f FROM lineitem
      GROUP BY l_orderkey
    ),
    o AS (
      SELECT COALESCE(lc.f, 0) AS fanout
      FROM orders LEFT JOIN lc ON lc.l_orderkey = o_orderkey
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM o)
    SELECT CAST(fanout AS BIGINT) AS fanout,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(fanout * COUNT(*) AS BIGINT) AS n_lines,
           CAST(COUNT(*) AS DOUBLE) / MAX(tot.n) AS share_of_orders
    FROM o CROSS JOIN tot
    GROUP BY fanout
    """,
)
def dq_join_fanout_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality profile of orders⋈lineitem: the distribution
    of lines per order INCLUDING childless orders (fanout 0) — the
    number a query planner, a memory-sizing estimate, or a data
    contract ("an order has 1–7 lines") needs before anyone writes the
    join.  A fat tail here is the early warning for join skew
    (``dq_key_skew_profile`` names the hot keys; this says how heavy
    the multiplicity distribution is overall).

    One lineitem aggregate keyed on the join key, one left join
    against orders (same key — co-locatable/bucketable), one
    map-combined histogram over the tiny fanout domain, and a
    broadcast 1-row total; the share is a single integer division at
    the edge.  Counts are exact end-to-end.
    """
    lc = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count("*").alias("f"))
    )
    ok = load_table(spark, sf_dir, "orders").select("o_orderkey")
    o = ok.join(
        lc, F.col("o_orderkey") == F.col("l_orderkey"), "left"
    ).select(F.coalesce(F.col("f"), F.lit(0)).cast("long").alias("fanout"))
    # the left join on the GROUPED (unique) key never duplicates, so
    # the total is just the orders row count — don't re-execute the
    # lineitem aggregate + join a second time for one number.
    tot = ok.agg(F.count("*").alias("n"))
    return (
        o.crossJoin(F.broadcast(tot))
        .groupBy("fanout")
        .agg(
            F.count("*").alias("n_orders"),
            F.max("n").alias("_n"),
        )
        .select(
            "fanout",
            F.col("n_orders").cast("long").alias("n_orders"),
            (F.col("fanout") * F.col("n_orders")).cast("long").alias("n_lines"),
            (F.col("n_orders").cast("double") / F.col("_n")).alias(
                "share_of_orders"
            ),
        )
    )
