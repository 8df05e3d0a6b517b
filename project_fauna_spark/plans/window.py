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

Round-9 window: the final 50 never-graded names (extras30 tail +
extras31..extras55) — identical to the import-order head, so for THIS
round the front-load is a verified no-op on the existing, swept order.
"""

# The checked-in manifest this list must equal (pinned by
# tests/test_window_manifest.py); rotated together with the list.
WINDOW_MANIFEST = "WINDOW_r9.txt"

GRADING_WINDOW: tuple[str, ...] = (
    "q_discount_demand_curve",
    "graph_kcore_peel",
    "text_winnowing_fingerprint",
    "text_tvd_language_drift",
    "agg_ratio_paradox_discount",
    "sketch_kmv_distinct",
    "sample_systematic_stride",
    "event_growth_accounting",
    "dq_sequence_gap_audit",
    "ingest_fixed_width_parse",
    "event_velocity_burst",
    "ml_first_order_ltv_corr",
    "text_langid_confusion",
    "sim_metric_rank_agreement",
    "graph_reciprocity",
    "sim_hard_negative_mining",
    "dq_embedding_norm_audit",
    "event_mix_shift_tvd",
    "ts_stream_gap_audit",
    "ts_theil_sen_trend",
    "q_unit_price_dispersion",
    "mm_signal_features",
    "udf_grouped_agg_median",
    "event_time_decay_attribution",
    "cdc_snapshot_diff",
    "llm_fim_split_plan",
    "event_streak_histogram",
    "llm_token_budget_apportion",
    "graph_degree_assortativity",
    "q_price_volume_mix",
    "dq_effective_categories",
    "text_vocab_coverage_curve",
    "ts_period_scan",
    "dq_numeric_corr_matrix",
    "sim_centroid_drift_halves",
    "dedup_boilerplate_ngrams",
    "mm_byte_uniformity_audit",
    "text_hapax_rate",
    "dedup_component_size_histogram",
    "ml_group_aware_split",
    "q_brand_return_rate",
    "sample_estimate_accuracy",
    "event_habit_hour",
    "q_growth_contribution_by_segment",
    "q_top_customer_churn",
    "dedup_incremental_new_batch",
    "llm_importance_resampling",
    "stream_dedup_suppress_repeats",
    "scalar_higher_order_fns",
    "dedup_component_representative",
)
