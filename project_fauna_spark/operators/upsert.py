"""Keyed upsert (MERGE) semantics — the reference README's future-work
item (idempotent re-runs / dedup on re-delivery,
/root/reference/README.md:151-158) as a relational operator.

Without a transactional table format, MERGE is: full-outer join on the
key, updates win, inserts pass through — rewrite the partition.  With
Delta/Iceberg the same ``merge_upsert`` call becomes the engine's
MERGE INTO; the semantics (and the idempotency property tested here)
are identical.

Scale: one shuffle on the key for the join; partitioned targets only
rewrite partitions that received updates (dynamic partition
overwrite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from project_fauna_spark.io import load_table
from project_fauna_spark.plans.registry import register


def merge_upsert(target: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """Upsert ``updates`` into ``target`` on ``key``: matching rows are
    replaced, new keys inserted, unmatched target rows kept.

    Idempotent: applying the same updates twice yields the same table.
    """
    cols = target.columns
    t = target.alias("t")
    u = updates.alias("u")
    joined = t.join(u, F.col(f"t.{key}") == F.col(f"u.{key}"), "full_outer")
    # True MERGE "updates win" semantics: presence of the update ROW
    # (key non-null) decides, per-row not per-column — an update row
    # carrying NULL in a column nulls out the target value, exactly as
    # MERGE INTO ... UPDATE SET col = u.col would.
    matched = F.col(f"u.{key}").isNotNull()
    merged = [
        F.when(matched, F.col(f"u.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
        for c in cols
    ]
    return joined.select(*merged)


@register(
    "etl_merge_upsert",
    oracle="""
    WITH target AS (
      SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey < 100
    ),
    updates AS (
      SELECT c_custkey, 'UPDATED#' || c_name AS c_name, c_acctbal + 1000.0 AS c_acctbal
      FROM customer WHERE c_custkey >= 50 AND c_custkey < 150
    )
    SELECT COALESCE(u.c_custkey, t.c_custkey) AS c_custkey,
           CASE WHEN u.c_custkey IS NOT NULL THEN u.c_name ELSE t.c_name END AS c_name,
           CASE WHEN u.c_custkey IS NOT NULL THEN u.c_acctbal ELSE t.c_acctbal END AS c_acctbal
    FROM target t FULL OUTER JOIN updates u ON t.c_custkey = u.c_custkey
    """,
)
def etl_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE demo: update keys [50,100), insert keys [100,150), keep
    keys [0,50) untouched — one full-outer join."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    target = c.filter(F.col("c_custkey") < 100)
    updates = c.filter((F.col("c_custkey") >= 50) & (F.col("c_custkey") < 150)).select(
        "c_custkey",
        F.concat(F.lit("UPDATED#"), F.col("c_name")).alias("c_name"),
        (F.col("c_acctbal") + 1000.0).alias("c_acctbal"),
    )
    return merge_upsert(target, updates, "c_custkey")
