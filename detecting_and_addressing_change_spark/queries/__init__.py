"""Declared query surface (SURVEY §2.8) + LLM-pipeline extensions.

Importing this package populates the registry; ``__spark_entry__.py`` exposes
it to the driver.
"""

from .registry import QUERIES, ORACLE_SQL, query  # noqa: F401
from . import relational  # noqa: F401,E402
from . import relational2  # noqa: F401,E402
from . import relational3  # noqa: F401,E402
from . import arrays_ml  # noqa: F401,E402
from . import extensions  # noqa: F401,E402
from . import extensions2  # noqa: F401,E402
from . import extensions3  # noqa: F401,E402
from . import extensions4  # noqa: F401,E402
from . import extensions5  # noqa: F401,E402
from . import extensions6  # noqa: F401,E402
from . import extensions7  # noqa: F401,E402
from . import extensions8  # noqa: F401,E402
from . import extensions9  # noqa: F401,E402
from . import drift  # noqa: F401,E402

# The external driver evaluates at most the first 50 registered queries per
# round (CORRECTNESS_r01.json covered exactly the first 50 names).  Rotate the
# registration order so queries without a driver-verified GREEN row yet come
# first; queries already attested green in a prior round go to the back.
# Relative order is preserved within each group.
#
# Round-5 policy (VERDICT r4 task #1): a driver-green row only counts as
# *current* if the query's implementation has not changed since the round
# that produced it.  Queries refactored in round 4 after their last green —
# q28/q39/q60 (array-native NB rewrite, operators/nb.py), x23 (graph.py
# large-star/small-star rework), q29 (metrics empty-input semantics),
# x14/x43/x44 (binary_ops vectorization), plus ADVICE-r4's q25 (oracle text
# refactor) and x37 (collect -> broadcast-join rewrite) — are deliberately
# NOT listed below so they float to the front of round 5's 50-query window
# and get fresh sf0.01 hash rows in CORRECTNESS_r05.json.
_ATTESTED_PRIOR_ROUNDS = frozenset({
    # green rows in CORRECTNESS_r01.json ∪ CORRECTNESS_r02.json
    "q01_scan_project_cast", "q02_filter_predicate", "q03_clean_text",
    "q04_word_count_topk", "q05_topk_tiebreak", "q06_inner_join",
    "q07_multi_join_agg", "q08_left_outer_join", "q09_semi_join",
    "q10_anti_join", "q11_broadcast_dim_join", "q12_grouped_agg",
    "q13_count_distinct", "q14_rollup", "q15_confusion_matrix_shape",
    "q16_window_rank", "q17_window_running_avg", "q18_window_lag",
    "q19a_intersect", "q19b_except", "q19c_union_all_count", "q20_case_flags",
    "q21_date_parts", "q22_hash_split", "q23_mse", "q24_count_window_mean",
    "q26_json_extract", "q27_sessionize",
    "q31_linear_map", "q32_poolings",
    "q33_seeded_noise_gate", "q34_time_window", "q35_cube", "q36_percentiles",
    "q37_string_functions", "q38_conditional_scalars",
    "q40_range_frame", "q41_first_last_nth",
    "q42_array_functions", "q43_asof_join", "q44_range_join_bins", "q45_pivot",
    "q46_grouping_sets", "q48_window_distribution", "q49_map_functions",
    "q50_interval_arithmetic", "q51_stats_aggregates", "q52_lstm_infer",
    "q53_correlated_subquery", "q54_unpivot", "q55_except_intersect_all",
    "q56_array_lambdas", "q57_topk_per_group", "q58_global_rank",
    "x01_dedup_exact", "x02_dedup_fingerprint", "x03_minhash_bands",
    "x04_minhash_pairs", "x05_simhash", "x06_ngram_jaccard",
    "x07_similarity_topk", "x08_similarity_ann_lsh", "x09_embedding_near_dup",
    "x10_text_stats", "x11_text_quality", "x12_lang_id",
    "x13_rolling_fingerprint", "x15_similarity_ivf",
    "x16_regex_tokens", "x17_tfidf_topk", "x18_bloom_join_filter",
    "x19_cms_heavy_hitters", "x20_stratified_sample", "x21_salted_skew_join",
    "x22_table_profile", "x24_vocab_encode",
    "x25_changelog_upsert", "x26_pii_scrub", "x27_length_histogram",
    "x28_bigram_topk", "x29_vector_quantize",
    "x34_mad_outliers", "x36_lstm_sequence",
    "x38_weighted_sample", "x41_table_diff",
    # green rows in CORRECTNESS_r03.json
    "q47_session_window",
    "x30_time_rollup", "x31_event_funnel",
    "x32_cohort_retention", "x33_fuzzy_join", "x39_sliding_window",
    "x40_ewma",
    "x45_similarity_ivf_multiprobe",
    # green rows in CORRECTNESS_r04.json (post-cap sigma semantics q30/q59;
    # literal-oracle upgrades x42/q61; the x46–x57 curation family)
    "q30_sigma_schedule_gate", "q59_gradual_drift_experiment",
    "q61_mapping_experiment", "x42_pca_project",
    "x46_quality_filter", "x47_repetition_signals", "x48_decontaminate",
    "x49_containment_pairs", "x50_centroid_shift", "x51_quality_drift_monitor",
    "x52_semantic_dedup_clusters", "x53_sequence_packing",
    "x54_model_quality_filter", "x55_curation_pipeline", "x56_winsorize",
    "x57_page_hinkley",
    # Deliberately NOT listed (implementation changed after last green; see
    # the round-5 policy note above): q25_ddm_drift_flags, q28_nb_fit_predict,
    # q29_classification_metrics, q39_abrupt_drift_experiment,
    # q60_unsupervised_drift_experiment, x14_multimodal_features,
    # x23_dedup_clusters, x37_bm25_topk, x43_audio_frames, x44_image_resize.
})


def _rotate_unattested_first() -> None:
    ordered = sorted(QUERIES, key=lambda n: n in _ATTESTED_PRIOR_ROUNDS)
    for mapping in (QUERIES, ORACLE_SQL):
        snapshot = {n: mapping[n] for n in ordered if n in mapping}
        mapping.clear()
        mapping.update(snapshot)


_rotate_unattested_first()

__all__ = ["QUERIES", "ORACLE_SQL", "query"]
