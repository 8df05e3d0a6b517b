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


def test_pii_scrub_is_idempotent_and_counts_injected(spark):
    """Re-scrubbing clean text finds nothing, and every doc carries
    exactly the injected email+ip+phone (corpus itself is PII-free)."""
    out = QUERIES["llm_pii_scrub"](spark, SF)
    assert out.filter(
        (F.col("n_emails") != 1) | (F.col("n_ips") != 1) | (F.col("n_phones") != 1)
    ).count() == 0
    rescrub = out.select(
        F.regexp_count(
            "clean_text",
            F.lit(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
        ).alias("still_email"),
        F.regexp_count(
            "clean_text", F.lit(r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b")
        ).alias("still_ip"),
    )
    assert rescrub.filter((F.col("still_email") > 0) | (F.col("still_ip") > 0)).count() == 0


def test_gopher_fracs_are_valid_and_cover_corpus(spark):
    out = QUERIES["llm_gopher_repetition"](spark, SF)
    n_docs = load_table(spark, SF, "documents").filter(
        F.size(F.split("text", " ")) >= 2
    ).count()
    assert out.count() == n_docs
    bad = out.filter(
        (F.col("top_word_frac") <= 0) | (F.col("top_word_frac") > 1)
        | (F.col("top_bigram_frac") <= 0) | (F.col("top_bigram_frac") > 1)
        | (F.col("top_word_n") > F.col("n_words"))
    )
    assert bad.count() == 0


def test_quantize_int8_reconstructs_within_one_step(spark):
    """Dequantized values must sit within one quantization step of the
    original: |x − q·s/127| ≤ s/127 (floor quantization)."""
    out = QUERIES["sim_quantize_int8"](spark, SF)
    emb = load_table(spark, SF, "embeddings")
    j = out.join(emb, "vec_id").select(
        "vec_id",
        "scale_max",
        F.zip_with(
            F.split(F.col("q8"), ","),  # q8 is array_join-ed at the graded edge
            F.col("embedding"),
            lambda q, x: F.abs(
                x.cast("double") - q.cast("double") * F.col("scale_max") / 127.0
            ),
        ).alias("errs"),
    )
    step = F.col("scale_max") / 127.0
    worst = j.select(
        "vec_id", F.array_max("errs").alias("max_err"), step.alias("step")
    )
    assert worst.filter(F.col("max_err") > F.col("step") * 1.0000001).count() == 0


def test_ewma_bounded_by_frame_extrema(spark):
    """A convex combination of frame values lies in [frame_min, frame_max]."""
    from pyspark.sql import Window as W

    e = load_table(spark, SF, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-15, 0)
    bounds = e.select(
        "event_id",
        F.min("value").over(w).alias("lo"),
        F.max("value").over(w).alias("hi"),
    )
    out = QUERIES["ts_ewma_bounded"](spark, SF).join(bounds, "event_id")
    eps = 1e-9
    assert out.filter(
        (F.col("ewma") < F.col("lo") - eps) | (F.col("ewma") > F.col("hi") + eps)
    ).count() == 0


def test_lang_mix_is_balanced_at_min_count(spark):
    out = QUERIES["llm_balance_lang_mix"](spark, SF)
    counts = [r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()]
    d = load_table(spark, SF, "documents")
    target = min(
        r["n"] for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()
    )
    assert counts and all(c == target for c in counts)


def test_attribution_touch_precedes_purchase(spark):
    out = QUERIES["event_last_touch_attribution"](spark, SF)
    assert out.filter(F.col("attributed") & (F.col("touch_lag_us") <= 0)).count() == 0
    assert out.filter(
        F.col("attributed") & (F.col("touch_lag_us") > 604800000000)
    ).count() == 0
    # attributed rows carry a touch id; unattributed rows carry none
    assert out.filter(F.col("attributed") & F.col("touch_event_id").isNull()).count() == 0
    assert out.filter(~F.col("attributed") & F.col("touch_event_id").isNotNull()).count() == 0


def test_vocab_ids_are_dense_and_count_ordered(spark):
    rows = QUERIES["llm_vocab_topk"](spark, SF).orderBy("token_id").collect()
    assert [r["token_id"] for r in rows] == list(range(1, len(rows) + 1))
    ns = [r["n"] for r in rows]
    assert ns == sorted(ns, reverse=True)


def test_mad_outlier_fences_are_consistent(spark):
    out = QUERIES["dq_outlier_mad"](spark, SF).collect()
    for r in out:
        assert r["mad"] > 0 and r["n_outliers"] <= r["n"]
        # max_robust_z > 3 iff some outlier exists
        assert (r["n_outliers"] > 0) == (r["max_robust_z"] > 3.0)


def test_chunk_manifest_reassembles_every_char(spark):
    """Part lengths must sum to each doc's n_chars and part numbering
    must be dense from 1."""
    out = QUERIES["mm_chunk_manifest"](spark, SF)
    agg = out.groupBy("doc_id").agg(
        F.sum("part_chars").alias("total"),
        F.count("*").alias("parts"),
        F.max("part_no").alias("max_part"),
    )
    d = load_table(spark, SF, "documents").select("doc_id", F.length("text").alias("n"))
    j = agg.join(d, "doc_id")
    assert j.filter(F.col("total") != F.col("n")).count() == 0
    assert j.filter(F.col("parts") != F.col("max_part")).count() == 0


def test_rfm_scores_are_quintiles(spark):
    out = QUERIES["event_rfm_segmentation"](spark, SF)
    for c in ["r_score", "f_score", "m_score"]:
        rng = out.agg(F.min(c).alias("lo"), F.max(c).alias("hi")).collect()[0]
        assert rng["lo"] == 1 and rng["hi"] == 5
    # quintile sizes differ by at most 1
    sizes = [r["n"] for r in out.groupBy("r_score").agg(F.count("*").alias("n")).collect()]
    assert max(sizes) - min(sizes) <= 1


def test_recursive_depth_is_log2(spark):
    rows = QUERIES["sql_recursive_cte"](spark, SF).collect()
    import math

    for r in rows:
        expect = 0 if r["doc_id"] == 0 else int(math.log2(r["doc_id"])) + 1
        assert r["depth"] == expect, (r, expect)


def test_gaps_islands_partition_events(spark):
    out = QUERIES["window_gaps_islands"](spark, SF)
    n_events = load_table(spark, SF, "events").count()
    total = out.agg(F.sum("island_len")).collect()[0][0]
    assert total == n_events
    # islands are true runs: len == end - start + 1
    assert out.filter(
        F.col("island_len") != F.col("island_end") - F.col("island_start") + 1
    ).count() == 0


def test_bitmap_distinct_equals_exact(spark):
    bm = {
        r["event_type"]: r["n_distinct_users"]
        for r in QUERIES["agg_bitmap_distinct"](spark, SF).collect()
    }
    e = load_table(spark, SF, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    assert bm == exact
