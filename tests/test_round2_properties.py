"""Semantic invariants for the round-2 operator families.

The oracle gate proves cross-engine equality; these tests prove the
operators mean what they claim — properties that would survive even if
both engines shared a bug.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from project_fauna_spark.io import load_table
from project_fauna_spark.plans import QUERIES

SF = "/root/testdata/sf0.01"


def test_funnel_is_monotonic(spark):
    rows = {r["stage"]: r["n_users"] for r in QUERIES["event_funnel_stages"](spark, SF).collect()}
    assert rows["1_view"] >= rows["2_click"] >= rows["3_purchase"]
    assert rows["3_purchase"] >= 0


def test_retention_week0_covers_every_cohort_user(spark):
    """Every user is active in their own first week, so the offset-0
    rows partition the user population exactly."""
    out = QUERIES["event_retention_cohort"](spark, SF).collect()
    week0 = sum(r["active_users"] for r in out if r["week_offset"] == 0)
    n_users = load_table(spark, SF, "events").select("user_id").distinct().count()
    assert week0 == n_users


def test_sessionization_partitions_events_and_respects_gap(spark):
    sess = QUERIES["event_sessionize_lag_cumsum"](spark, SF)
    n_events = sess.agg(F.sum("n_events")).collect()[0][0]
    assert n_events == load_table(spark, SF, "events").count()
    # consecutive sessions of a user must be > 30 min apart
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("session_no")
    gaps = (
        sess.withColumn("prev_end", F.lag("session_end").over(w))
        .filter(F.col("prev_end").isNotNull())
        .withColumn(
            "gap_s",
            F.unix_timestamp("session_start", "yyyy-MM-dd HH:mm:ss")
            - F.unix_timestamp("prev_end", "yyyy-MM-dd HH:mm:ss"),
        )
    )
    assert gaps.filter(F.col("gap_s") <= 1800 - 1).count() == 0


def test_pagerank_conserves_scaled_mass_within_leakage(spark):
    """Ranks stay positive and bounded: each round injects 0.15 and
    redistributes ≤ 0.85 of the previous mass (dangling/dst-only nodes
    leak), so total ∈ (0.15·N·SCALE, N·SCALE]."""
    out = QUERIES["graph_pagerank_trade"](spark, SF).collect()
    n = len(out)
    total = sum(r["rank_scaled"] for r in out)
    assert all(r["rank_scaled"] >= 150_000_000 for r in out)
    assert 0.15 * n * 1_000_000_000 < total <= n * 1_000_000_000


def test_containment_bounds_and_symmetric_base(spark):
    out = QUERIES["dedup_containment"](spark, SF).collect()
    for r in out:
        assert 0.7 <= r["containment"] <= 1.0
        assert r["doc_a"] < r["doc_b"]


def test_mark_join_flag_matches_semi_join_count(spark):
    out = QUERIES["join_mark_exists"](spark, SF)
    n_flagged = out.filter(F.col("has_recent_order")).count()
    o = load_table(spark, SF, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    )
    c = load_table(spark, SF, "customer")
    expected = c.join(o, c.c_custkey == o.o_custkey, "left_semi").count()
    assert n_flagged == expected
    assert out.count() == c.count()  # mark join never drops rows


def test_reservoir_sample_is_stable_and_k_bounded(spark):
    a = sorted(map(tuple, QUERIES["sample_reservoir_hash"](spark, SF).collect()))
    b = sorted(map(tuple, QUERIES["sample_reservoir_hash"](spark, SF).collect()))
    assert a == b  # deterministic across invocations
    per_lang = {}
    for doc_id, lang, rn in a:
        per_lang.setdefault(lang, 0)
        per_lang[lang] += 1
    assert all(v <= 5 for v in per_lang.values())
