"""Physical-plan assertions: the plans must BE the scale-correct
plans, not merely produce correct rows.

These tests read `.explain("formatted")` output (no execution beyond
planning) and pin the properties the 100 TB design depends on:
predicate pushdown into parquet, column pruning, broadcast of dims,
top-k via TakeOrderedAndProject, window-group-limit pushdown, and the
absence of Python evaluation in pure-expression operators.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from project_fauna_spark.plans import QUERIES

SF = "/root/testdata/sf0.01"


def plan_of(spark, name: str) -> str:
    df = QUERIES[name](spark, SF)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# The four registry-wide lints each need every query's plan; building
# 392 DataFrames costs ~2.5 min per walk, so they share ONE cache of
# (analyzed, optimized, formatted) triples built on first use.
_REGISTRY_PLANS: dict[str, tuple] = {}


def _registry_plans(spark) -> dict[str, tuple]:
    if _REGISTRY_PLANS:
        return _REGISTRY_PLANS
    from project_fauna_spark.cache import release_cached

    for name in sorted(QUERIES):
        df = QUERIES[name](spark, SF)
        release_cached()  # plan-only walk; don't pin caches session-wide
        qe = df._jdf.queryExecution()
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        _REGISTRY_PLANS[name] = (qe.analyzed(), qe.optimizedPlan(), buf.getvalue())
    return _REGISTRY_PLANS


def test_filter_pushdown_to_parquet(spark):
    plan = plan_of(spark, "q_revenue_forecast")
    assert "PushedFilters: [" in plan
    # The shipdate range must reach the scan (row-group pruning).
    assert "l_shipdate" in plan.split("PushedFilters")[1].split("]")[0]


def test_column_pruning(spark):
    plan = plan_of(spark, "sort_limit_global")
    # The scan must read only the two projected columns.
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "o_orderkey" in read and "o_totalprice" in read
    assert "o_orderdate" not in read and "o_orderstatus" not in read


def test_dim_joins_broadcast(spark):
    plan = plan_of(spark, "join_broadcast_chain")
    assert plan.count("BroadcastHashJoin") >= 2  # nation + region
    assert "CartesianProduct" not in plan


def test_global_topk_avoids_full_sort(spark):
    plan = plan_of(spark, "sort_limit_global")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan  # no global sort


def test_per_group_topk_uses_window_group_limit(spark):
    plan = plan_of(spark, "topk_per_group")
    assert "WindowGroupLimit" in plan


def test_pure_expression_ops_have_no_python(spark):
    # These are claimed UDF-free: no Python evaluation anywhere.
    for name in [
        "ref_split_friends",
        "ref_epoch_normalize",
        "text_fingerprint",
        "dedup_ngram_jaccard",
        "sim_knn_brute_cosine",
        "agg_pricing_summary",
    ]:
        plan = plan_of(spark, name)
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name
        assert "MapInPandas" not in plan, name


def test_no_rowwise_python_udf_anywhere(spark):
    """Repo invariant: NO registered query may contain a row-at-a-time
    Python UDF (BatchEvalPython).  Arrow-batched stages
    (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas) are the
    only sanctioned Python evaluation."""
    offenders = []
    for name, (_, _, plan) in _registry_plans(spark).items():
        if "BatchEvalPython" in plan:
            offenders.append(name)
    assert offenders == [], offenders


def test_pandas_stages_are_arrow_not_rowwise(spark):
    plan = plan_of(spark, "udf_pandas_scalar")
    assert "ArrowEvalPython" in plan  # vectorized, not BatchEvalPython
    assert "BatchEvalPython" not in plan


def test_asof_join_is_single_shuffle_window(spark):
    plan = plan_of(spark, "join_asof_latest_order")
    # One hash partitioning exchange on the key; window over it; no join node.
    assert "Window" in plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    import re

    exchanges = re.findall(r"\(\d+\) Exchange", plan)
    assert len(exchanges) == 1, plan


def test_corpus_clean_reuses_cached_intermediate(spark):
    """The cleaned corpus must be computed once (cache), not 3×."""
    plan = plan_of(spark, "llm_corpus_clean")
    assert "InMemoryTableScan" in plan


def test_dedup_self_joins_use_cache(spark):
    """Self-joined dedup intermediates must come from the cache."""
    for name in ["dedup_ngram_jaccard", "dedup_minhash_lsh"]:
        plan = plan_of(spark, name)
        assert "InMemoryTableScan" in plan, name


def test_q6_pushes_all_predicates(spark):
    plan = plan_of(spark, "q_revenue_forecast")
    pushed = plan.split("PushedFilters")[1].split("]")[0]
    for col in ["l_shipdate", "l_discount", "l_quantity"]:
        assert col in pushed, col


def test_round2_decorrelated_subqueries_are_joins(spark):
    """EXISTS/NOT EXISTS shapes must plan as semi/anti joins —
    never nested-loop subquery evaluation."""
    plan = plan_of(spark, "q_order_priority_count")
    assert "LeftSemi" in plan
    plan = plan_of(spark, "q_dormant_rich_customers")
    assert "LeftAnti" in plan
    plan = plan_of(spark, "q_supplier_part_variety")
    assert "LeftAnti" in plan


def test_lateral_topn_decorrelates_to_window_group_limit(spark):
    """The SQL-standard LATERAL LIMIT subquery must reach the same
    WindowGroupLimit physical plan as the DataFrame top-k — the whole
    point of expressing it declaratively."""
    plan = plan_of(spark, "sql_lateral_topn")
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_reservoir_sample_uses_window_group_limit(spark):
    plan = plan_of(spark, "sample_reservoir_hash")
    assert "WindowGroupLimit" in plan


def test_ohlc_is_pure_aggregate_no_window(spark):
    """Struct-ordered open/close keep OHLC an aggregate (partial+final
    SortAggregate — struct-typed min/max buffers are sort-based), never
    a window pass: one exchange on the bucket key, no per-group event
    buffering."""
    import re

    plan = plan_of(spark, "ts_ohlc_downsample")
    assert "SortAggregate" in plan or "HashAggregate" in plan
    assert "Window" not in plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1


def test_sessionize_windows_share_one_exchange(spark):
    """lag + running-sum + final agg must reuse a single user_id
    exchange (all three are (user_id)-compatible)."""
    import re

    plan = plan_of(spark, "event_sessionize_lag_cumsum")
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1


def test_pagerank_has_no_cartesian_or_collect(spark):
    plan = plan_of(spark, "graph_pagerank_trade")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dpp_query_prunes_fact_partitions(spark):
    """The partitioned-fact join must carry a dynamic pruning
    subquery in the fact scan's partition filters."""
    plan = plan_of(spark, "join_dynamic_partition_pruning")
    assert "dynamicpruning" in plan or "DynamicPruning" in plan


def test_exact_substring_no_cartesian_no_python(spark):
    plan = plan_of(spark, "dedup_exact_substring")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "PushedFilters" in plan or "Scan parquet" in plan


def _window_arg_groups(plan: str):
    """For each `(n) Window` node, the count of top-level `[...]` groups
    on its Arguments line: partitioned windows have 3 (exprs,
    partition, order), global windows only 2 (exprs, order)."""
    import re

    lines = plan.splitlines()
    out = []
    for i, line in enumerate(lines):
        # exact node name: "(n) WindowGroupLimit" has a different
        # Arguments format and must not be parsed as a Window node
        if re.fullmatch(r"\(\d+\) Window", line.strip()):
            for j in range(i + 1, min(i + 4, len(lines))):
                arg = lines[j].strip()
                if arg.startswith("Arguments:"):
                    depth = 0
                    groups = 0
                    for ch in arg:
                        if ch == "[":
                            if depth == 0:
                                groups += 1
                            depth += 1
                        elif ch == "]":
                            depth -= 1
                    out.append(groups)
                    break
    return out


def test_window_arg_group_parser_detects_global_window(spark):
    """Negative control: a deliberately global ntile must show 2 arg
    groups, a partitioned one 3 — otherwise the ccnet pin is vacuous."""
    from pyspark.sql import Window as W, functions as F

    df = spark.range(10).withColumn("r", F.ntile(3).over(W.orderBy("id")))
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    assert _window_arg_groups(buf.getvalue()) == [2]
    df2 = spark.range(10).withColumn(
        "r", F.ntile(3).over(W.partitionBy((F.col("id") % 2)).orderBy("id"))
    )
    buf2 = io.StringIO()
    with redirect_stdout(buf2):
        df2.explain("formatted")
    assert _window_arg_groups(buf2.getvalue()) == [3]


def test_ccnet_buckets_has_no_global_window(spark):
    """Every Window in the distributed-ntile plan must carry partition
    expressions — no single-task global window stage."""
    groups = _window_arg_groups(plan_of(spark, "llm_ccnet_buckets"))
    assert groups, "expected at least one Window node"
    assert all(g == 3 for g in groups), f"global window present: {groups}"


def test_market_basket_broadcasts_counts_and_takes_ordered(spark):
    plan = plan_of(spark, "q_market_basket_lift")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan


def test_minhash_md5_band_join_is_hash_join(spark):
    plan = plan_of(spark, "dedup_minhash_md5")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_temporal_scd2_join_is_keyed_not_cartesian(spark):
    plan = plan_of(spark, "join_temporal_scd2")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_semantic_ivf_codebook_broadcasts(spark):
    plan = plan_of(spark, "dedup_semantic_ivf")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_two_phase_ranks_never_funnel_raw_data(spark):
    """Round-6 de-skew claim: the row-level rank windows (the ones that
    see the raw table) must partition by (key, bucket), never the
    low-cardinality key alone — only the tiny per-bucket offset tables
    may window on the bare key.  Pinned by asserting the spec that
    orders by the row-level sort column also carries its bucket key."""
    import re

    cases = [
        ("event_time_to_convert", "latency_sec", "bkt"),
        ("llm_microbatch_padding", "doc_id", "sub"),
        ("agg_approx_percentile_bound", "l_extendedprice", "bucket"),
        ("agg_weighted_median", "l_extendedprice", "bkt"),
    ]
    for name, row_col, bucket_col in cases:
        plan = plan_of(spark, name)
        specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
        row_specs = [s for s in specs if row_col in s]
        assert row_specs, f"{name}: no window orders by {row_col}?"
        for s in row_specs:
            assert bucket_col in s, (
                f"{name}: raw-data window lost its {bucket_col} de-skew key: {s}"
            )


def test_round6_late_bucketed_windows_carry_bucket_key(spark):
    """Batches 27/28/33: raw-data adjacent-diff / rank windows must
    carry their bucket key (same de-skew rule as the two-phase ranks)."""
    import re

    cases = [
        ("sample_systematic_stride", "hv", "bucket"),
        ("dq_sequence_gap_audit", "key", "bucket"),
        ("ts_stream_gap_audit", "us", "bucket"),
    ]
    for name, row_col, bucket_col in cases:
        plan = plan_of(spark, name)
        specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
        row_specs = [s for s in specs if row_col in s and bucket_col not in s]
        # every window ordering by the row column must carry the bucket
        # key; the only bare-key windows allowed are over the tiny
        # bucket-summary frame (those order by bucket, not the row col)
        assert not row_specs, f"{name}: raw window lost its bucket key: {row_specs}"


def test_round6_late_joins_never_cartesian(spark):
    for name in (
        "event_audience_overlap",
        "sim_hard_negative_mining",
        "graph_kcore_peel",
        "sim_metric_rank_agreement",
        "graph_degree_assortativity",
        "event_time_decay_attribution",
    ):
        plan = plan_of(spark, name)
        assert "CartesianProduct" not in plan, name


def test_fim_split_plan_is_shuffle_free(spark):
    """llm_fim_split_plan is pure per-row expression work — the plan
    must contain NO exchange and NO Python evaluation at all."""
    plan = plan_of(spark, "llm_fim_split_plan")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_phash_and_signal_use_arrow_not_rowwise(spark):
    for name, marker in (
        ("mm_phash_dedup", "MapInPandas"),
        ("udf_grouped_agg_median", "ArrowAggregatePython"),
    ):
        plan = plan_of(spark, name)
        assert "BatchEvalPython" not in plan, name
        assert marker in plan, f"{name}: expected {marker} in plan"



# ---- shared bounded-subtree heuristic for the registry-wide lints ----------
# SF_MARKERS / subtree_bounded moved to plans/lint.py (single source of
# truth shared with bench.py's global-window warning attribution, so
# the lint and the bench tail can't drift apart); marker semantics are
# documented there.
from project_fauna_spark.plans.lint import (
    GLOBAL_WINDOW_ALLOWED,
    SF_MARKERS,
    global_windows,
    subtree_bounded,
)


def test_no_forced_broadcast_of_sf_scaling_tables(spark):
    """Repo invariant (round-7): a forced F.broadcast() hint may only
    wrap a BOUNDED-cardinality frame (nation/region, codebooks, offset
    tables, aggregates, probe sets).  Hinting a frame that scales with
    SF (part / supplier / customer / orders / lineitem projections or
    filters) forces a build side that blows Spark's 8 GB broadcast
    ceiling at large SF and disables AQE's fallback — a hard failure at
    the 100 TB target, while buying nothing at bench scale where AQE
    would broadcast anyway.

    Heuristic: walk every registered query's ANALYZED plan; for each
    broadcast ResolvedHint, the hinted subtree is bounded iff it
    contains an Aggregate / GlobalLimit node (its output keyspace, not
    the scan, is what ships), a Deduplicate whose dedup KEYS reference
    no SF-scaling key column (distinct order-status / calendar months /
    mod-m Bloom positions are domain-bounded; a ``distinct o_custkey``
    still scales with SF and does NOT bound — ADVICE r7), or references
    no SF-scaling TPC-H base column at all.  nation/region columns are
    not markers — those tables are fixed-size by construction.
    """
    offenders = []
    for name, (analyzed, _, _) in _registry_plans(spark).items():
        stack = [analyzed]
        while stack:
            node = stack.pop()
            if node.getClass().getSimpleName() == "ResolvedHint" and (
                "broadcast" in node.hints().toString().lower()
            ):
                sub = node.child().toString()
                if any(m in sub for m in SF_MARKERS) and not subtree_bounded(
                    node.child()
                ):
                    offenders.append(name)
            cs = node.children()
            for i in range(cs.size()):
                stack.append(cs.apply(i))
    assert sorted(set(offenders)) == [], sorted(set(offenders))


def test_no_global_window_over_sf_scaling_data(spark):
    """Repo invariant (round-8, VERDICT r7 item 3): a Window with an
    EMPTY partitionSpec serializes its entire input through one task —
    the classic scale-killer at 100 TB.  It is legal only when the
    window's input is provably bounded per the shared
    ``subtree_bounded`` rule: an Aggregate / GlobalLimit in the
    subtree (the window runs over a summary frame, e.g. the ≤25-row
    duration-distinct frame in event_survival_km or a bucket-offsets
    table), a Deduplicate over non-SF-scaling keys, or no SF-scaling
    TPC-H base key referenced at all (events/documents/embeddings
    frames are pre-aggregated or SF-invariant slices wherever they meet
    a bare window — pinned per-query below and by the bucketed-window
    tests).

    This converts the per-query pins (`test_ccnet_buckets_has_no_
    global_window`, docstring promises in extras15/17/39/44) into a
    registry-wide lint, the same template as
    test_no_forced_broadcast_of_sf_scaling_tables.
    """
    # window_ntile's global ntile runs over the SF-invariant
    # `o_orderkey < 5000` slice (the partitioned variant is computed
    # alongside as the at-scale shape — see relational.py docstring);
    # the slice references o_orderkey, so the marker heuristic can't
    # see its boundedness.
    # Single walk: plans.lint.global_windows IS the detection logic,
    # shared verbatim with bench.py's warning attribution (ADVICE r9) —
    # this test only applies it registry-wide and asserts zero offenders.
    allowed = GLOBAL_WINDOW_ALLOWED
    offenders = []
    for name, (analyzed, _, _) in _registry_plans(spark).items():
        if name in allowed:
            continue
        _, unbounded = global_windows(analyzed)
        if unbounded:
            offenders.append(name)
    assert sorted(set(offenders)) == [], sorted(set(offenders))


def test_no_full_width_scans_of_wide_tables(spark):
    """Repo invariant (round-8): every parquet scan of a WIDE table
    (≥5 columns) must be column-pruned — ``ReadSchema`` narrower than
    the table — unless the operator provably consumes every column.
    At 100 TB an unpruned lineitem scan reads ~2× the bytes of the
    typical 5-6 column analytical projection; pruning is free when the
    plan is declarative, so a full-width scan means a dropped
    projection (e.g. a ``select('*')`` passthrough before a join).

    This converts the ad-hoc end-of-round scan-width audits (CLAUDE.md
    round-8 notes) into a registry-wide lint, parsing the cached
    formatted physical plans: each ``Scan parquet`` block's
    ``Output [N]`` against the table width from its ``Location`` line.

    Allowlist — operators whose semantics consume the full row:
    - link_blocked_records: Fellegi-Sunter linkage blocks on
      (p_brand, p_size) and compares p_type/p_name/p_retailprice with
      p_partkey as the pair id — all 6 of part's 6 columns.
    """
    import re

    # Widths come from the LIVE parquet schemas, not a hard-coded map:
    # the driver regenerates /root/testdata between rounds, and a table
    # that gained or lost a column would make a frozen map silently
    # under- or over-trigger (ADVICE r8).
    all_widths = {
        t: len(spark.read.parquet(f"{SF}/{t}.parquet").columns)
        for t in (
            "region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "events", "documents", "embeddings",
        )
    }
    widths = {t: n for t, n in all_widths.items() if n >= 5}
    allowed = {("link_blocked_records", "part")}
    loc_pat = re.compile(r"Location:.*?/(\w+)\.parquet")
    offenders = []
    for name, (_, _, plan) in _registry_plans(spark).items():
        for m in re.finditer(r"\(\d+\) Scan parquet[^\n]*\n((?:[^\n]+\n)+)", plan):
            block = m.group(1)
            loc = loc_pat.search(block)
            out = re.search(r"Output \[(\d+)\]", block)
            if not (loc and out):
                continue
            table, n = loc.group(1), int(out.group(1))
            if table in widths and n >= widths[table] and (name, table) not in allowed:
                offenders.append((name, table, n))
    assert sorted(set(offenders)) == [], sorted(set(offenders))


def test_no_cartesian_of_two_sf_scaling_frames(spark):
    """Repo invariant (round-8): a cross join (logical Cross, or Inner
    with no condition) is the all-pairs scale-killer when BOTH inputs
    scale with SF.  Legitimate crosses in this engine always have at
    least one bounded side (a 1-row scalar aggregate, a sweep/spine
    frame, a codebook) that the physical planner broadcasts.  This
    generalizes the per-query CartesianProduct pins to the whole
    registry, with the same bounded-subtree rule as the broadcast and
    global-window lints."""
    def scaling(side):
        return any(m in side.toString() for m in SF_MARKERS) and not subtree_bounded(side)

    offenders = []
    for name, (_, optimized, _) in _registry_plans(spark).items():
        stack = [optimized]
        while stack:
            node = stack.pop()
            if node.getClass().getSimpleName() == "Join":
                jt = node.joinType().toString()
                if jt == "Cross" or (jt == "Inner" and node.condition().isEmpty()):
                    if scaling(node.left()) and scaling(node.right()):
                        offenders.append(name)
            cs = node.children()
            for i in range(cs.size()):
                stack.append(cs.apply(i))
    assert sorted(set(offenders)) == [], sorted(set(offenders))
