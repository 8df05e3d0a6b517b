"""Robustness: repeated invocation, empty results, sf0.001 smoke.

The driver may call any query multiple times, at different scale
factors, from a session the engine didn't build — none of that may
change results or crash.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from project_fauna_spark.io import load_table
from project_fauna_spark.plans import QUERIES

SF = "/root/testdata/sf0.01"
SF_SMOKE = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", ["agg_pricing_summary", "dedup_ngram_jaccard", "etl_paginated_scan"])
def test_repeated_invocation_is_stable(spark, name):
    """Same query, three invocations → identical results."""
    runs = [sorted(map(tuple, QUERIES[name](spark, SF).collect())) for _ in range(3)]
    assert runs[0] == runs[1] == runs[2]


def test_empty_result_filters_do_not_crash(spark):
    """A filter matching nothing flows through aggregates/windows."""
    l = load_table(spark, SF, "lineitem").filter(F.col("l_quantity") < -1)
    assert l.count() == 0
    agg = l.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("decimal(30,8)")).cast("double").alias("s")
    )
    assert agg.count() == 0
    global_agg = l.agg(F.count("*").alias("n"), F.sum("l_quantity").alias("s")).collect()
    assert global_agg[0]["n"] == 0 and global_agg[0]["s"] is None


@pytest.mark.parametrize(
    "name",
    [
        "agg_pricing_summary",
        "join_asof_latest_order",
        "dedup_exact_text",
        "sim_knn_brute_cosine",
        "text_tfidf_topk",
        "stream_session_window",
        "llm_pack_shards",
        "dedup_connected_components",  # near-empty pair graph at sf0.001
        "llm_chunk_documents",
        "llm_decontaminate",
        "llm_train_val_split",
        "text_fuzzy_match_levenshtein",
        "graph_pagerank_trade",  # near-empty edge graph at sf0.001
        "event_funnel_stages",
        "dedup_containment",
        "q_avg_yearly_small_qty",  # may select zero small-qty rows at sf0.001
        "join_asof_tolerance",
        # round-2 batch 3-4 families at degenerate scale
        "dq_outlier_mad",  # constant-valued groups → mad 0 must not throw
        "event_rfm_segmentation",
        "event_view_abandonment",
        "event_dau_wau_stickiness",
        "event_path_to_purchase",
        "window_moving_corr",  # 1-row frames gate to NULL
        "ts_ewma_bounded",
        "llm_balance_lang_mix",
        "llm_vocab_topk",
        "sql_recursive_cte",
        "join_dynamic_partition_pruning",
        "llm_gopher_repetition",
    ],
)
def test_queries_run_at_smoke_scale(spark, name):
    """Queries survive the sf0.001 smoke scale (driver entry() scale)."""
    df = QUERIES[name](spark, SF_SMOKE)
    assert df.count() >= 0  # no crash; schema resolvable
    assert len(df.columns) > 0


def test_registry_consistency():
    """Every oracle key has a query; rows-only queries are the known
    hash/sketch/RNG set (a new unoracled query must be a deliberate
    choice, not a typo)."""
    from project_fauna_spark.plans import ORACLE, QUERIES

    assert set(ORACLE) <= set(QUERIES)
    rows_only = set(QUERIES) - set(ORACLE)
    # Round 5: the last six hash/sketch queries received bound-style
    # oracles (exact deterministic values + honestly-computed quality
    # booleans the oracle emits as literal TRUE — the
    # agg_hll_sketch_merge pattern), so EVERY registered query now has
    # a DuckDB oracle.  A new unoracled query must be a deliberate
    # choice, not a typo.
    assert rows_only == set(), rows_only


def test_query_names_are_stable_identifiers():
    from project_fauna_spark.plans import QUERIES
    import re

    for name in QUERIES:
        assert re.fullmatch(r"[a-z][a-z0-9_]*", name), name


def test_connected_components_transitivity(spark):
    """A near-dup CHAIN a-b, b-c must collapse into ONE component even
    when (a, c) themselves are not a near-dup pair — the property
    greedy pair-drop dedup lacks."""
    from project_fauna_spark.plans import QUERIES

    out = QUERIES["dedup_connected_components"](spark, "/root/testdata/sf0.01")
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 500
    # component id is always the component's min doc id
    for r in rows.values():
        assert r["component_id"] <= r["doc_id"]
        assert rows[r["component_id"]]["component_id"] == r["component_id"]
    # membership counts are consistent
    from collections import Counter

    sizes = Counter(r["component_id"] for r in rows.values())
    for r in rows.values():
        assert r["n_members"] == sizes[r["component_id"]]
    assert any(n > 2 for n in sizes.values())  # at least one real chain


def test_merge_upsert_null_overwrites(spark):
    """MERGE 'updates win' semantics: an update row carrying NULL in a
    column nulls out the target value (row presence decides, not
    per-column coalesce)."""
    from project_fauna_spark.operators.upsert import merge_upsert

    target = spark.createDataFrame(
        [(1, "old", 10.0), (2, "keep", 20.0)], "k long, name string, val double"
    )
    updates = spark.createDataFrame(
        [(1, None, 99.0), (3, "new", 30.0)], "k long, name string, val double"
    )
    out = {r["k"]: r for r in merge_upsert(target, updates, "k").collect()}
    assert out[1]["name"] is None and out[1]["val"] == 99.0  # NULL overwrote
    assert out[2]["name"] == "keep"
    assert out[3]["name"] == "new"


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    """A testdata dir with every table present but ZERO rows (schemas
    cloned from sf0.001) — the degenerate corpus a regenerated-testdata
    edge case could approach.  Queries must not throw (ANSI division,
    NULL folds); empty or NULL-row results are fine."""
    root = tmp_path_factory.mktemp("fauna_empty_sf")
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        df = spark.read.parquet(f"{SF_SMOKE}/{t}.parquet").limit(0)
        df.coalesce(1).write.mode("overwrite").parquet(str(root / f"{t}.parquet"))
    return str(root)


@pytest.mark.parametrize(
    "name",
    [
        # division/ratio edges and sweeps from round 6
        "agg_weighted_median",
        "ts_cusum_changepoint",
        "dq_control_chart",
        "llm_judge_agreement_kappa",
        "event_bounce_rate",
        "event_time_to_convert",
        "llm_microbatch_padding",
        "llm_span_corruption_plan",
        "layout_deletion_vector_stats",
        "text_readability_flesch",
        "dedup_paragraph_hash",
        "dq_cross_field_rules",
        # a spread of older division-bearing paths
        "agg_pricing_summary",
        "text_tfidf_topk",
        "dedup_exact_text",
    ],
)
def test_queries_survive_empty_corpus(spark, empty_sf, name):
    # The collect() itself is the contract: no ANSI divide-by-zero, no
    # NULL-fold crash.  Row-level results are legitimately empty (or a
    # single NULL-ish global-aggregate row), so only shape is checked.
    rows = QUERIES[name](spark, empty_sf).collect()
    assert isinstance(rows, list)
