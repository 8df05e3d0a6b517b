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

Round-12 window: the third re-grade round — the 48 r4-era grades (the
largest staleness block, including the df-cap-era dedup/sim candidate
queries whose semantics two consecutive embeddings re-seeds could
perturb) plus the two riskiest r3 leftovers (llm_corpus_clean is a
memoized heavy oracle — grading it fresh re-validates its memo build;
text_quality_score is the float-scoring edge).  Risk ranking in
CLAUDE.md round-12 prep.
"""

# The checked-in manifest this list must equal (pinned by
# tests/test_window_manifest.py); rotated together with the list.
WINDOW_MANIFEST = "WINDOW_r12.txt"

GRADING_WINDOW: tuple[str, ...] = (
    "dedup_cross_modal_agreement",
    "dedup_exact_substring",
    "dedup_minhash_md5",
    "dedup_semantic_ivf",
    "sim_ann_ivf",
    "sim_ann_recall_audit",
    "sim_mmr_diversified",
    "llm_corpus_clean",
    "text_quality_score",
    "llm_bigram_likelihood",
    "llm_bpe_encode_corpus",
    "llm_bpe_pair_counts",
    "llm_bpe_train_merges",
    "llm_ccnet_buckets",
    "llm_e2e_dataset_build",
    "llm_mixture_temperature",
    "llm_oov_rate",
    "llm_pack_shards",
    "llm_quality_classifier",
    "llm_sample_temperature_mix",
    "ml_knn_classify_eval",
    "ml_standardize_audit",
    "mm_binary_meta",
    "mm_chunk_manifest",
    "mm_decode_features",
    "mm_frame_sample",
    "mm_integrity_rollup",
    "text_bigram_cond_prob",
    "text_doc_keywords",
    "ts_daily_anomaly",
    "ts_seasonal_naive_backtest",
    "dq_benford_first_digit",
    "dq_completeness_by_day",
    "dq_freshness_lag",
    "dq_k_anonymity",
    "dq_key_skew_profile",
    "dq_uniqueness_audit",
    "event_concurrency_gauge",
    "event_interarrival_stats",
    "event_new_vs_returning",
    "event_position_attribution",
    "join_temporal_scd2",
    "link_blocked_records",
    "mv_incremental_merge",
    "q_abc_pareto_classification",
    "q_market_basket_lift",
    "q_semi_additive_snapshot",
    "sql_group_by_all",
    "window_percent_of_total",
    "agg_percentile_exact",
)
