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

Round-11 window: the second re-grade round.  Risk-ranked per
CLAUDE.md round-11 prep: the 12 stalest float/composed r3-era grades
first (dedup_ngram_jaccard is the spliced truth oracle — grading it
fresh re-validates every memo splice site), then all 38 surviving
r2-era seats (join/set/window/scalar batteries — exact-typed, low
moving parts, but 8 rounds stale).
"""

# The checked-in manifest this list must equal (pinned by
# tests/test_window_manifest.py); rotated together with the list.
WINDOW_MANIFEST = "WINDOW_r11.txt"

GRADING_WINDOW: tuple[str, ...] = (
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "dedup_connected_components",
    "dedup_containment",
    "sim_knn_brute_cosine",
    "sim_ann_lsh_bucketed",
    "sim_label_centroid",
    "sim_radius_search",
    "sim_quantize_int8",
    "text_tfidf_topk",
    "text_fuzzy_match_levenshtein",
    "llm_gopher_repetition",
    "agg_count_distinct",
    "agg_cube",
    "agg_grouping_sets",
    "agg_pivot",
    "agg_rollup",
    "join_broadcast_chain",
    "join_cross",
    "join_full_outer",
    "join_inner_equi",
    "join_left_anti",
    "join_left_outer",
    "join_left_semi",
    "join_range_band",
    "join_right_outer",
    "join_theta_quantity_over_size",
    "ref_animals_transform",
    "ref_batch_chunks",
    "ref_split_friends",
    "scalar_array_fns",
    "scalar_bit_fns",
    "scalar_conditional_fns",
    "scalar_json_fns",
    "scalar_math_fns",
    "scalar_regex_fns",
    "scalar_string_fns",
    "set_except",
    "set_except_all",
    "set_intersect",
    "set_intersect_all",
    "set_union_all",
    "set_union_distinct",
    "sort_limit_global",
    "topk_per_group",
    "window_first_last_nth",
    "window_lag_lead",
    "window_ntile",
    "window_range_frame",
    "window_rank",
)
