"""The driver's grading window, as an explicit front-load list.

The external driver grades the FIRST 50 entries of ``QUERIES`` each
round.  Through round 9 that order was steered purely by module import
order in ``plans/__init__`` — workable while windows were whole
never-graded modules, but round-10+ windows are RE-grades whose names
span ~30 modules (WINDOW_r10.draft.txt), where module moves would be
churn for churn's sake.

``GRADING_WINDOW`` is the sanctioned mechanism from round 9 on:
``plans/__init__`` front-loads these names (in this order) to the head
of the registry after all modules import; every other entry keeps its
import-order position.  Rotating the window for a new round is a
one-list edit here (plus WINDOW_rN.txt for the manifest pin in
tests/test_window_manifest.py) — no module moves, no import-order
surgery, and cross-oracle ``oracle_builder`` composition is untouched
because it resolves before the reorder.

Round-10 window: the first RE-grade round (every registered query has
been driver-graded green at least once after r9).  Risk-ranked per
CLAUDE.md round-10 prep: bound-style boolean oracles (10), deferred-
builder composed oracles (12), fixture/IO-path queries (10), then the
stalest r2/r3-era grades with float/timestamp/Arrow edges (18).
Unlike r9 this front-load REORDERS the registry head — the names span
~30 modules, which is exactly why this mechanism exists.
"""

# The checked-in manifest this list must equal (pinned by
# tests/test_window_manifest.py); rotated together with the list.
WINDOW_MANIFEST = "WINDOW_r10.txt"

GRADING_WINDOW: tuple[str, ...] = (
    "semi_percentile_approx",
    "agg_hll_sketch_merge",
    "dedup_minhash_lsh",
    "dedup_simhash64",
    "text_hashed_tf",
    "agg_approx_count_distinct",
    "ml_tfidf_pipeline",
    "ml_minhash_lsh",
    "ml_brp_lsh_neighbors",
    "agg_approx_percentile_bound",
    "dedup_minhash_recall_audit",
    "dedup_threshold_sweep",
    "join_bloom_semi_prefilter",
    "llm_classifier_calibration",
    "llm_dedup_impact_on_mixture",
    "llm_dedup_token_savings",
    "llm_near_dup_rate_by_source",
    "ml_ndcg_eval",
    "ml_pca_covariance",
    "sim_ivf_nprobe_sweep",
    "sim_ivf_pq_search",
    "sim_pq_adc",
    "etl_paginated_scan",
    "etl_fetch_transform",
    "etl_batch_post",
    "ingest_jsonlines_roundtrip",
    "ingest_csv_roundtrip",
    "ingest_from_json_struct",
    "ingest_xml_roundtrip",
    "ingest_orc_roundtrip",
    "ingest_schema_evolution",
    "ingest_partitioned_pruning",
    "agg_pricing_summary",
    "agg_variance_stats",
    "agg_multi_distinct",
    "window_distribution",
    "window_running_sum",
    "stream_session_window",
    "stream_sliding_window",
    "stream_tumbling_window",
    "stream_watermark_late_drop",
    "scalar_date_fns",
    "ref_epoch_normalize",
    "ref_validate_iso",
    "join_asof_latest_order",
    "join_asof_tolerance",
    "udf_pandas_scalar",
    "udf_grouped_map",
    "udf_cogroup",
    "udf_explode_generator",
)
