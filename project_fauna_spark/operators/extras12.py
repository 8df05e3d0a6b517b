"""Round-6 batch 6: Bloom-filter semi-join prefilter.

Registered AFTER the round-6 grading window block (plans/__init__) —
new registrations must never perturb the first-50 window the driver
grades (pinned by tests/test_window_manifest.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from project_fauna_spark.io import load_table
from project_fauna_spark.plans.registry import register

_BLOOM_M = 8192  # bit positions
_BLOOM_K = 3  # hash functions


def _bloom_oracle() -> str:
    from project_fauna_spark.operators._oracle_shared import sql_h32 as _sql_h32

    pos = lambda i: (  # noqa: E731
        f"({_sql_h32('CAST(c_custkey AS VARCHAR)', f'bloom{i}:')} % {_BLOOM_M})"
    )
    opos = lambda i: (  # noqa: E731
        f"({_sql_h32('CAST(o_custkey AS VARCHAR)', f'bloom{i}:')} % {_BLOOM_M})"
    )
    return f"""
    WITH s AS (
      SELECT DISTINCT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    ),
    bloom AS (
      SELECT DISTINCT pos FROM s,
        unnest([{", ".join(pos(i) for i in range(_BLOOM_K))}]) AS t(pos)
    ),
    opos AS (
      SELECT o_orderkey, o_custkey, i,
             CASE i {" ".join(f"WHEN {i} THEN {opos(i)}" for i in range(_BLOOM_K))} END AS pos
      FROM orders, unnest(range({_BLOOM_K})) AS t(i)
    ),
    passed AS (
      SELECT o_orderkey, ANY_VALUE(o_custkey) AS o_custkey
      FROM opos JOIN bloom USING (pos)
      GROUP BY o_orderkey
      HAVING COUNT(DISTINCT i) = {_BLOOM_K}
    ),
    stats AS (
      SELECT
        (SELECT COUNT(*) FROM s) AS n_small_keys,
        (SELECT COUNT(*) FROM orders) AS n_big_rows,
        (SELECT COUNT(*) FROM orders o JOIN s ON s.c_custkey = o.o_custkey)
          AS n_exact_pass,
        (SELECT COUNT(*) FROM passed) AS n_bloom_pass,
        (SELECT COUNT(*) FROM passed p JOIN s ON s.c_custkey = p.o_custkey)
          AS n_bloom_true
    )
    SELECT CAST(n_small_keys AS BIGINT) AS n_small_keys,
           CAST(n_big_rows AS BIGINT) AS n_big_rows,
           CAST(n_exact_pass AS BIGINT) AS n_exact_pass,
           CAST(n_bloom_pass AS BIGINT) AS n_bloom_pass,
           n_bloom_true = n_exact_pass AS no_false_negatives,
           CASE WHEN n_big_rows > n_exact_pass
                THEN CAST(n_bloom_pass - n_exact_pass AS DOUBLE)
                     / (n_big_rows - n_exact_pass) END AS fp_rate,
           CAST(n_big_rows - n_bloom_pass AS DOUBLE) / n_big_rows
             AS shuffle_reduction
    FROM stats
    """


@register("join_bloom_semi_prefilter", oracle_builder=_bloom_oracle)
def join_bloom_semi_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join prefilter: build an 8192-position, 3-hash
    Bloom set over the selective dimension keys (BUILDING-segment
    customers), test every fact row against it, and audit what the
    filter buys — the runtime-filter pattern (Spark's own
    ``spark.sql.optimizer.runtime.bloomFilter``) made explicit, with
    exact false-positive accounting.

    At 100 TB this is the shuffle-volume lever: the Bloom set is a few
    KB broadcast to every scan task, and only passing fact rows enter
    the join shuffle — ``shuffle_reduction`` is the fraction of fact
    bytes that never leave the mappers.  No false negatives by
    construction (a member's positions are all present), verified
    honestly as a compared boolean.

    Parity: positions come from the repo's portable salted-md5 32-bit
    hash (``extras3._h32`` twin spelled identically in DuckDB), so both
    engines build the SAME Bloom set — every output is an exact integer
    or one guarded division.  The membership test is an inverted-index
    join (fact positions × broadcast position set, count-distinct = k),
    never a per-row array scan.

    m is deliberately FIXED at 8192 so the audit exposes load-factor
    economics across scale factors (sf0.1: ~2.9k keys → 66% fill → 29%
    FP yet still a 57% shuffle cut); a production filter sizes
    m ≈ 10·|keys| to hold FP ≈ 1%.
    """
    from project_fauna_spark.functions.wordhash import h32 as _h32

    def pos(col: Column, i: int) -> Column:
        return _h32(col.cast("string"), f"bloom{i}:") % _BLOOM_M

    from project_fauna_spark.cache import cached

    cust = load_table(spark, sf_dir, "customer")
    # s feeds the bloom build, the exact semi-join, and the FP audit;
    # passed feeds two aggregates — persist both so the md5 position
    # computation and the membership join run once, not per-consumer.
    s = cached(
        cust.filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
        .distinct()
    )
    bloom = (
        s.select(
            F.explode(
                F.array(*[pos(F.col("c_custkey"), i) for i in range(_BLOOM_K)])
            ).alias("pos")
        )
        .distinct()
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    opos = o.select(
        "o_orderkey",
        "o_custkey",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        pos(F.col("o_custkey"), i).alias("pos"),
                    )
                    for i in range(_BLOOM_K)
                ]
            )
        ).alias("t"),
    ).select("o_orderkey", "o_custkey", "t.i", "t.pos")
    passed = cached(
        opos.join(F.broadcast(bloom), "pos")
        .groupBy("o_orderkey")
        .agg(
            F.any_value("o_custkey").alias("o_custkey"),
            F.countDistinct("i").alias("k_hit"),
        )
        .filter(F.col("k_hit") == _BLOOM_K)
    )
    n_small = s.agg(F.count("*").alias("n_small_keys"))
    n_big = o.agg(F.count("*").alias("n_big_rows"))
    n_exact = (
        o.join(s, o.o_custkey == s.c_custkey, "left_semi")
        .agg(F.count("*").alias("n_exact_pass"))
    )
    n_pass = passed.agg(F.count("*").alias("n_bloom_pass"))
    n_true = (
        passed.join(s, passed.o_custkey == s.c_custkey, "left_semi")
        .agg(F.count("*").alias("n_bloom_true"))
    )
    stats = (
        n_small.crossJoin(n_big)
        .crossJoin(n_exact)
        .crossJoin(n_pass)
        .crossJoin(n_true)
    )
    non_members = F.col("n_big_rows") - F.col("n_exact_pass")
    return stats.select(
        F.col("n_small_keys").cast("long").alias("n_small_keys"),
        F.col("n_big_rows").cast("long").alias("n_big_rows"),
        F.col("n_exact_pass").cast("long").alias("n_exact_pass"),
        F.col("n_bloom_pass").cast("long").alias("n_bloom_pass"),
        (F.col("n_bloom_true") == F.col("n_exact_pass")).alias("no_false_negatives"),
        F.when(
            non_members > 0,
            (F.col("n_bloom_pass") - F.col("n_exact_pass")).cast("double")
            / non_members,
        ).alias("fp_rate"),
        (
            (F.col("n_big_rows") - F.col("n_bloom_pass")).cast("double")
            / F.col("n_big_rows")
        ).alias("shuffle_reduction"),
    )
