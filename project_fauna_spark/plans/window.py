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

Round-13 window: the fourth re-grade round — the 16 remaining r3-era
grades plus 32 of the 45 r5-era names (dedup/sim/text families first
per the CLAUDE.md risk ranking), plus the two round-11 additions
(dq_psi_drift, sample_pps_systematic — the only registry names with
no driver grade ever; VERDICT r11 item 3 seats them here, displacing
the exact-typed scalar_url_fns + dq_props_key_profile to the r14
pool).  Risk ranking in CLAUDE.md round-13 prep.
"""

# The checked-in manifest this list must equal (pinned by
# tests/test_window_manifest.py); rotated together with the list.
WINDOW_MANIFEST = "WINDOW_r13.txt"

GRADING_WINDOW: tuple[str, ...] = (
    "dedup_cluster_representative",
    "dedup_exact_blocked",
    "dedup_exact_text",
    "dedup_incremental_base_vs_new",
    "dedup_simhash_md5",
    "sim_centroid_confusion",
    "text_fingerprint",
    "text_langid_ngram",
    "text_ngram_freq",
    "text_normalized_collisions",
    "text_token_stats",
    "llm_balance_lang_mix",
    "llm_blocklist_filter",
    "llm_chunk_documents",
    "llm_contamination_overlap",
    "llm_dataset_manifest",
    "llm_decontaminate",
    "llm_dedup_survivorship_report",
    "llm_gap_fill_forward",
    "llm_packing_efficiency",
    "llm_pii_scrub",
    "llm_seq_len_histogram",
    "llm_train_val_split",
    "llm_vocab_topk",
    "sketch_cms_heavy_hitters",
    "ml_training_snapshot_asof",
    "graph_degree_distribution",
    "graph_pagerank_trade",
    "graph_triangle_count",
    "event_cohort_ltv",
    "event_error_follows_purchase",
    "event_funnel_stages",
    "event_last_touch_attribution",
    "event_path_to_purchase",
    "event_retention_cohort",
    "event_rfm_segmentation",
    "event_sessionize_lag_cumsum",
    "event_type_transitions",
    "event_view_abandonment",
    "ts_ewma_bounded",
    "window_gaps_islands",
    "window_moving_corr",
    "join_asof_nearest",
    "dq_fact_consistency_audit",
    "dq_functional_dependencies",
    "dq_outlier_mad",
    "sample_pps_systematic",
    "q_percentile_bands_daily",
    "agg_gini_concentration",
    "dq_psi_drift",
)
