"""Round-6 batch 36: time-decay attribution and CDC snapshot diffing.

Registered AFTER the round-6 grading window block (plans/__init__) —
new registrations must never perturb the first-50 window the driver
grades (pinned by tests/test_window_manifest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from project_fauna_spark.cache import cached
from project_fauna_spark.io import load_table
from project_fauna_spark.plans.registry import register, sql_dsum

# --------------------------------------------------------------------------
# event_time_decay_attribution — the third canonical multi-touch model
# --------------------------------------------------------------------------

_ATTR_WINDOW_DAYS = 7


@register(
    "event_time_decay_attribution",
    # Weights 2^-age_days for age 0..7 are exact dyadic rationals
    # (spelled 128 >> age over a 128 denominator — integer bit-shift,
    # no pow/libm), and each purchase's weight SUM is an exact multiple
    # of 1/128, so every per-touch share is ONE IEEE division of exact
    # dyadics.  The cross-row credit sum re-enters decimal (dsum).
    oracle=f"""
    WITH v AS (SELECT user_id, CAST(ts AS DATE) AS vday FROM events
               WHERE event_type = 'view'),
    p AS (SELECT event_id AS purchase_id, user_id,
                 CAST(ts AS DATE) AS pday
          FROM events WHERE event_type = 'purchase'),
    t AS (
      SELECT p.purchase_id, v.vday,
             CAST(128 // (1 << date_diff('day', v.vday, p.pday)) AS BIGINT)
               AS w128
      FROM p JOIN v
        ON v.user_id = p.user_id
       AND v.vday <= p.pday
       AND date_diff('day', v.vday, p.pday) <= {_ATTR_WINDOW_DAYS}
    ),
    tot AS (SELECT purchase_id, CAST(SUM(w128) AS BIGINT) AS tw
            FROM t GROUP BY 1),
    sh AS (
      SELECT t.vday,
             CAST(t.w128 AS DOUBLE) / CAST(tot.tw AS DOUBLE) AS share
      FROM t JOIN tot USING (purchase_id)
    )
    SELECT vday AS view_day,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           {sql_dsum('share', 30, 12)} AS credit
    FROM sh GROUP BY vday
    """,
)
def event_time_decay_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decay multi-touch attribution: every view within 7 days
    before a purchase earns weight 2^(−age_days), normalized per
    purchase so credit is CONSERVED (each attributable purchase hands
    out exactly 1.0), then rolled up by view day — the third canonical
    model beside ``event_last_touch_attribution`` (winner-take-all)
    and ``event_position_attribution`` (U-shaped 40/20/40), the one
    marketers reach for when recency matters but the last click
    shouldn't take everything.

    Float discipline: the dyadic weight is the INTEGER ``128 >> age``
    over a fixed 128 denominator (no pow), each share is one IEEE
    division of exact integers, and the only cross-row float sum —
    the day's credit — accumulates in decimal at scale 12 (shares are
    ≤ 1; VARCHAR-routed in the oracle).  Scale: the touch join is
    user-keyed and banded to 7 days; the totals table is
    purchase-keyed (broadcastable at dashboard scale, co-keyed join
    otherwise).
    """
    e = load_table(spark, sf_dir, "events")
    v = e.filter(F.col("event_type") == "view").select(
        "user_id", F.to_date("ts").alias("vday")
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.to_date("ts").alias("pday"),
    )
    age = F.datediff(F.col("pday"), F.col("vday"))
    t = cached(
        p.join(
            v,
            (p.user_id == v.user_id)
            & (F.col("vday") <= F.col("pday"))
            & (age <= _ATTR_WINDOW_DAYS),
        ).select(
            "purchase_id",
            "vday",
            # shiftleft with a COLUMN bit count needs the SQL spelling
            # (the Python helper only takes a literal int).
            F.expr(
                "CAST(128 DIV shiftleft(1, datediff(pday, vday)) AS LONG)"
            ).alias("w128"),
        )
    )
    tot = t.groupBy("purchase_id").agg(F.sum("w128").alias("tw"))
    sh = t.join(tot, "purchase_id").select(
        "vday",
        (F.col("w128").cast("double") / F.col("tw").cast("double")).alias("share"),
    )
    return sh.groupBy(F.col("vday").alias("view_day")).agg(
        F.count("*").alias("n_touches"),
        F.sum(F.col("share").cast("decimal(30,12)")).cast("double").alias("credit"),
    )


# --------------------------------------------------------------------------
# cdc_snapshot_diff — what changed between two as-of states?
# --------------------------------------------------------------------------

_SNAP_T1 = "1998-06-30"
_SNAP_T2 = "1999-06-30"


@register(
    "cdc_snapshot_diff",
    oracle=f"""
    WITH log AS (
      SELECT o_custkey AS key, o_orderdate AS ts, o_orderkey AS version
      FROM orders
    ),
    s1 AS (
      SELECT key, MAX(struct_pack(t := ts, v := version)).v AS v
      FROM log WHERE ts <= DATE '{_SNAP_T1}' GROUP BY key
    ),
    s2 AS (
      SELECT key, MAX(struct_pack(t := ts, v := version)).v AS v
      FROM log WHERE ts <= DATE '{_SNAP_T2}' GROUP BY key
    ),
    d AS (
      SELECT s1.key AS k1, s2.key AS k2,
             s1.v AS v1, s2.v AS v2
      FROM s1 FULL OUTER JOIN s2 ON s1.key = s2.key
    )
    SELECT '{_SNAP_T1}' AS t1, '{_SNAP_T2}' AS t2,
           CAST(COUNT(k1) AS BIGINT) AS n_keys_t1,
           CAST(COUNT(k2) AS BIGINT) AS n_keys_t2,
           CAST(SUM(CASE WHEN k1 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_added,
           CAST(SUM(CASE WHEN k1 IS NOT NULL AND k2 IS NOT NULL
                          AND v1 <> v2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_changed,
           CAST(SUM(CASE WHEN k1 IS NOT NULL AND v1 = v2
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged
    FROM d
    """,
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-to-snapshot diff of a CDC-materialized state: treat
    each customer's order stream as their change log (the
    ``cdc_scd2_intervals`` convention), materialize the latest-version
    state as of two dates a year apart, and report
    added / changed / unchanged key counts — the reconciliation every
    warehouse runs after a backfill ("did the re-sync move exactly
    the keys it should have?").  ``mv_incremental_merge`` applies a
    delta; this VERIFIES one.

    Each as-of state is one filtered max-struct aggregate (latest by
    (date, version) — order-independent, map-combined); the diff is a
    single key-keyed full outer join.  No deletes exist in this log
    (append-only), so removed-keys is structurally zero and omitted —
    ``cdc_tombstone_compaction`` owns the delete path.
    """
    log = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("key"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_orderkey").alias("version"),
    )
    latest = F.max(
        F.struct(F.col("ts").alias("t"), F.col("version").alias("v"))
    )["v"]

    def state(cutoff: str, alias: str) -> DataFrame:
        return (
            log.filter(F.col("ts") <= F.lit(cutoff).cast("date"))
            .groupBy("key")
            .agg(latest.alias(alias))
        )

    s1 = state(_SNAP_T1, "v1").withColumnRenamed("key", "k1")
    s2 = state(_SNAP_T2, "v2").withColumnRenamed("key", "k2")
    d = s1.join(s2, s1.k1 == s2.k2, "full_outer")
    agg = d.agg(
        F.count("k1").alias("n_keys_t1"),
        F.count("k2").alias("n_keys_t2"),
        F.sum(F.when(F.col("k1").isNull(), 1).otherwise(0)).alias("n_added"),
        F.sum(
            F.when(
                F.col("k1").isNotNull()
                & F.col("k2").isNotNull()
                & (F.col("v1") != F.col("v2")),
                1,
            ).otherwise(0)
        ).alias("n_changed"),
        F.sum(
            F.when(F.col("k1").isNotNull() & (F.col("v1") == F.col("v2")), 1).otherwise(
                0
            )
        ).alias("n_unchanged"),
    )
    return agg.select(
        F.lit(_SNAP_T1).alias("t1"),
        F.lit(_SNAP_T2).alias("t2"),
        "n_keys_t1",
        "n_keys_t2",
        "n_added",
        "n_changed",
        "n_unchanged",
    )
