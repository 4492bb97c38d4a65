"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship crop_video query at sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2 as a
``(spark, sf_dir) -> DataFrame`` callable; ``oracle_sql()`` gives the DuckDB
twin for each hash-checkable query. Implementations live in
``videos_to_tfrecords_spark/plans/``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# importing the query modules populates the registry
import videos_to_tfrecords_spark.plans.reference_queries  # noqa: F401,E402
import videos_to_tfrecords_spark.plans.relational_queries  # noqa: F401,E402

try:  # extension modules land incrementally; keep the contract importable
    import videos_to_tfrecords_spark.plans.text_queries  # noqa: F401,E402
except ImportError:
    pass
try:
    import videos_to_tfrecords_spark.plans.similarity_queries  # noqa: F401,E402
except ImportError:
    pass
try:
    import videos_to_tfrecords_spark.plans.pipeline_queries  # noqa: F401,E402
except ImportError:
    pass
try:
    import videos_to_tfrecords_spark.plans.advanced_queries  # noqa: F401,E402
except ImportError:
    pass
try:
    import videos_to_tfrecords_spark.plans.tpch_queries  # noqa: F401,E402
except ImportError:
    pass
try:
    import videos_to_tfrecords_spark.plans.graph_queries  # noqa: F401,E402
except ImportError:
    pass
try:
    import videos_to_tfrecords_spark.plans.feature_queries  # noqa: F401,E402
except ImportError:
    pass
try:
    import videos_to_tfrecords_spark.plans.mining_queries  # noqa: F401,E402
except ImportError:
    pass
try:
    import videos_to_tfrecords_spark.plans.learning_queries  # noqa: F401,E402
except ImportError:
    pass

from videos_to_tfrecords_spark.plans.registry import ORACLES, QUERIES  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"

# Queries already hash-verified by the driver in CORRECTNESS_r01/r02/r03.
# The driver's per-round snapshot only covers a ~50-entry prefix of the
# registry, so we order never-driver-checked queries FIRST and push these
# previously-verified ones to the back — every query gets driver coverage
# across rounds without dropping any from the registry.
_DRIVER_VERIFIED_R1_R2 = (
    "crop_video_events", "tumbling_window_stats", "full_video_sequences",
    "single_frame_sequences", "filename_extension_filter",
    "filename_extract_label", "hash_bucket_split_counts",
    "random_split_sizes", "shuffle_preserves_multiset",
    "frame_downsample_buckets", "arithmetic_normalize", "url_parsing",
    "timestamp_formatting", "sliding_window_stats_paned", "pricing_summary",
    "customers_by_region", "revenue_by_priority", "customers_with_orders",
    "customers_without_orders", "order_status_set_ops",
    "top_orders_per_customer", "running_quantity_by_supplier",
    "distinct_flag_status", "rollup_quantity", "pivot_status_quantity",
    "global_top_orders", "distinct_parts_per_flag", "approx_distinct_parts",
    "json_props_histogram", "part_brand_stats", "supplier_shipped_revenue",
    "tpch_q3_shipping_priority", "tpch_q10_returned_items",
    "doc_token_stats", "doc_quality_score", "doc_lang_id",
    "doc_fingerprint", "doc_exact_dedup", "doc_minhash_lsh_pairs",
    "doc_ngram_jaccard_pairs", "doc_simhash", "doc_dup_clusters",
    "corpus_bigram_topk", "dedup_corpus_summary", "lateral_token_positions",
    "doc_normalized_text", "sequence_packing_summary", "stratified_sample",
    "doc_characteristic_terms", "quality_filter_by_lang",
    "ann_topk_bruteforce", "ann_topk_ivf", "ann_topk_lsh",
    "embedding_norm_by_label", "embedding_threshold_pairs", "multimodal_meta",
)

# Names in the driver-of-record CORRECTNESS_r03.json snapshot (50 full
# passes). Same back-of-the-line tier as the r01/r02 set.
_DRIVER_VERIFIED_R3 = (
    "tpch_q18_large_volume", "tpch_q21_waiting_suppliers",
    "tpch_q6_forecast_revenue", "tpch_q22_global_sales_opportunity",
    "doc_repetition_signals", "mixture_resample", "doc_decontamination",
    "doc_pii_scrub", "doc_bigram_lm_nll", "doc_line_dedup",
    "doc_quality_classifier", "embedding_dup_clusters",
    "streaming_stream_stream_join", "jsonl_source_roundtrip",
    "csv_source_roundtrip", "streaming_cms_counts",
    "overlap_shipping_windows", "user_sessions_udtf", "variant_props_stats",
    "gap_filled_daily_counts", "tpch_q2_min_cost_supplier",
    "tpch_q4_order_priority", "tpch_q7_volume_shipping",
    "tpch_q8_market_share", "tpch_q9_product_profit",
    "tpch_q11_important_stock", "tpch_q12_shipping_priority_mode",
    "tpch_q13_customer_distribution", "tpch_q14_promotion_effect",
    "tpch_q15_top_supplier", "tpch_q16_parts_supplier",
    "tpch_q17_small_quantity_revenue", "tpch_q19_discounted_revenue",
    "tpch_q20_potential_promotion", "graph_pagerank_trade",
    "graph_ppr_region_affinity", "graph_triangles_copurchase",
    "bm25_topk_docs", "knn_loo_accuracy", "embedding_gram_matrix",
    "ewma_user_value", "skyline_parts", "weighted_doc_sample",
    "cms_bigram_frequencies", "pca_power_component",
    "source_shingle_containment", "equidepth_value_histogram",
    "doc_chunking", "doc_simhash_hamming_pairs", "event_value_outliers",
)

# The 49 registry entries with no driver-of-record row after r03's rotation
# (judge verified all 49 out-of-band in round 3: "0 failures / 155 queries").
# FRONT of the r04 snapshot prefix so the driver union r01-r04 covers the
# whole registry (VERDICT r03, next-round item #1).
_JUDGE_ONLY_R3 = (
    "doc_bpe_token_estimate", "doc_oov_rate", "uniform_sample_exact_k",
    "dedup_keep_best", "ann_topk_lsh_multiprobe", "embedding_quantize_int8",
    "media_decode_frames", "inference_logits", "video_pipeline_e2e",
    "streaming_tumbling_counts", "video_pipeline_crop_mode",
    "asof_last_purchase", "user_sessions", "salted_revenue_by_supplier",
    "quantity_percentiles", "shipment_gaps", "above_nation_average",
    "string_functions", "date_functions", "cube_quantity", "sql_frontend_q5",
    "array_functions", "regexp_functions", "conditional_functions",
    "bag_set_ops", "session_window_native", "salted_join_revenue",
    "merge_upsert_orders", "price_quartiles_ntile", "vocab_token_ids",
    "outer_join_profile", "interval_range_join", "event_funnel",
    "zorder_values", "hll_sketch_union_distinct", "user_value_trend",
    "event_value_fill_forward", "doc_negative_samples",
    "grouped_split_assignment", "geometric_mean_value", "lang_id_confusion",
    "doc_duplicate_spans", "bpe_train_merges", "bpe_token_counts",
    "doc_unigram_entropy", "nation_supplier_hhi",
    "referential_integrity_audit", "customer_rfm_segments",
    "order_cohort_retention",
)

# Names with a green (or rows-only-by-design) row in CORRECTNESS_r04.json.
# embedding_quantize_int8 is deliberately EXCLUDED: its r04 row was the
# driver-canonicalization error, so it stays in the front tier until the
# reshaped (vec_id, dim, q) output gets a green driver row.
_DRIVER_VERIFIED_R4 = (
    "doc_bpe_token_estimate", "doc_oov_rate", "uniform_sample_exact_k",
    "dedup_keep_best", "ann_topk_lsh_multiprobe", "media_decode_frames",
    "inference_logits", "video_pipeline_e2e", "streaming_tumbling_counts",
    "video_pipeline_crop_mode", "user_value_trend", "event_value_fill_forward",
    "doc_negative_samples", "grouped_split_assignment", "geometric_mean_value",
    "lang_id_confusion", "doc_duplicate_spans", "bpe_train_merges",
    "bpe_token_counts", "doc_unigram_entropy", "nation_supplier_hhi",
    "referential_integrity_audit", "customer_rfm_segments",
    "order_cohort_retention", "asof_last_purchase", "user_sessions",
    "salted_revenue_by_supplier", "quantity_percentiles", "shipment_gaps",
    "above_nation_average", "string_functions", "date_functions",
    "cube_quantity", "sql_frontend_q5", "array_functions", "regexp_functions",
    "conditional_functions", "bag_set_ops", "session_window_native",
    "salted_join_revenue", "merge_upsert_orders", "price_quartiles_ntile",
    "vocab_token_ids", "outer_join_profile", "interval_range_join",
    "event_funnel", "zorder_values", "hll_sketch_union_distinct",
    "grouping_sets_revenue",
)

# The 63 round-4 additions whose only hash check is the judge's r4
# out-of-band run (plus embedding_quantize_int8, red in r04 on the
# canonicalization error and since reshaped to scalar rows). FRONT of the
# r05 snapshot prefix so the driver union r01-r05 covers ≥206/219
# (VERDICT r04, next-round items #1 and #3).
_JUDGE_ONLY_R4 = (
    "embedding_quantize_int8",
    "acf_user_value", "ann_recall_at_k", "audio_energy_windows",
    "bootstrap_mean_ci", "classifier_auc_by_group", "classifier_auc_eval",
    "classifier_calibration_bins", "corpus_curation_e2e",
    "curation_funnel_census", "data_quality_checks", "dataset_fingerprint",
    "doc_pretokenize_census", "doc_token_fertility", "doc_trigram_interp_nll",
    "dsir_importance_weights", "embedding_jl_projection",
    "event_markov_transitions", "fuzzy_name_pairs",
    "graph_feature_propagation", "graph_kcore_trade", "graph_link_prediction",
    "graph_local_clustering", "graph_lpa_communities",
    "graph_negative_edge_samples", "graph_weighted_pagerank",
    "hard_negative_mining", "hll_portable_union_distinct",
    "incremental_agg_maintenance", "join_key_skew_report",
    "kmeans_cluster_profile", "length_bucket_batching",
    "linreg_extprice_normal_eq", "mahalanobis_event_outliers",
    "market_basket_rules", "media_phash_dup_pairs", "mixture_alpha_weights",
    "mutual_information_fields", "nested_subset_curve",
    "orc_source_roundtrip", "packed_concat_spans",
    "purchase_attribution_first_touch", "purchase_attribution_last_touch",
    "record_linkage_scores", "rolling_median_value",
    "scd2_point_in_time_join", "scd2_priority_history",
    "seasonal_dow_anomaly", "semantic_dedup_keep",
    "shadow_inference_agreement", "sliding_distinct_users",
    "snapshot_diff_orders", "source_quota_sample", "streaming_dedup_events",
    "streaming_session_windows", "streaming_value_drift",
    "table_profile_lineitem", "tfrecord_source_roundtrip", "token_pmi_pairs",
    "unpivot_part_metrics", "value_drift_chisq", "value_drift_emd",
    "vocab_coverage_curve", "vocab_zipf_slope",
)


# The 120 round-5 additions with no driver-of-record row after r05's
# ~50-entry snapshot (judge verified all out-of-band: "0 failures / 325").
# Registry order. FRONT of the r06 snapshot prefix (VERDICT r05 item #2),
# led by curation_funnel_census — r05's one red row, fixed this round by
# swapping the funnel's near-dedup stage to the lossless
# ngram_jaccard_pairs (VERDICT r05 item #1).
_JUDGE_ONLY_R5 = (
    "curation_funnel_census",
    "unpivot_part_metrics", "incremental_join_maintenance",
    "range_window_revenue", "ship_latency_by_priority",
    "subscription_regularity_topk", "source_quota_sample",
    "vocab_zipf_slope", "canary_contamination_scan", "fim_transform_census",
    "incremental_dedup_delta", "source_unigram_kl", "classifier_ece_summary",
    "rouge_adjacent_overlap", "heaps_law_fit", "brier_decomposition",
    "isotonic_calibration_fit", "threshold_tuning_max_f1",
    "coverage_source_selection", "minhash_estimate_calibration",
    "doc_containment_pairs", "classifier_eval_card",
    "edit_distance_adjacent", "hapax_rate_by_source",
    "bigram_lm_next_token_accuracy", "cross_source_duplication",
    "retrieval_ndcg_eval", "mmr_diversified_retrieval", "kcenter_coreset",
    "embedding_hubness_topk", "embedding_alignment_margin",
    "embedding_anisotropy", "quantization_recall_eval",
    "embedding_dedup_funnel_e2e", "fisher_discriminant_ratio",
    "embedding_intrinsic_dimension", "text_pipeline_e2e",
    "streaming_dedup_events", "streaming_session_windows",
    "label_noise_knn_audit", "value_drift_chisq", "value_drift_psi",
    "traffic_profile_dow_hour", "streaming_value_drift",
    "video_scene_segments", "rag_retrieval_e2e", "hybrid_rrf_fusion",
    "streaming_heavy_hitters", "streaming_hll_distinct",
    "ranker_rbo_agreement", "benford_first_digit",
    "mannwhitney_value_by_flag", "price_skewness_by_brand",
    "shipping_survival_curve", "order_volume_cusum",
    "trimmed_mean_price_by_flag", "customer_value_gini",
    "price_mad_robust_scale", "asof_nearest_purchase", "hll_accuracy_eval",
    "daily_anomaly_robust_z", "event_trigram_topk",
    "interarrival_exponential_gof", "capture_recapture_estimate",
    "count_overdispersion", "simpsons_paradox_scan", "hill_tail_index",
    "price_elasticity_by_brand", "event_order_inversions",
    "event_entropy_rate", "graph_hits_trade", "graph_degree_assortativity",
    "graph_bfs_distances", "graph_rich_club", "token_pmi_pairs",
    "vocab_coverage_curve", "table_profile_lineitem", "snapshot_diff_orders",
    "tfrecord_source_roundtrip", "k_anonymity_audit",
    "deletion_cascade_audit", "heavy_hitters_mg", "l_diversity_audit",
    "bloom_filter_fpr", "t_closeness_audit", "golden_record_survivorship",
    "value_drift_emd", "sliding_distinct_users", "shard_manifest",
    "supplier_bt_strength", "annotator_kappa", "preference_pipeline_e2e",
    "source_loo_value", "mcnemar_model_compare", "compaction_plan",
    "label_centroid_distances", "mixture_token_budget_plan",
    "sample_representativeness_audit", "cohort_did_purchase",
    "dataset_datasheet", "churn_training_frame", "bandit_replay_eval",
    "conformal_coverage_eval", "cv_fold_balance_audit",
    "preference_confound_audit", "crossmodal_integrity_audit",
    "crossmodal_spearman_length_norm", "markov_next_event_accuracy",
    "naive_bayes_source_eval", "knn_shapley_values", "eval_pass_at_k",
    "wilson_lower_bound_ranking", "dsir_effective_sample_size",
    "eval_best_of_k_value", "group_relative_advantage",
    "preference_transitivity_audit", "value_drift_ks",
    "copurchase_recommender_eval", "two_proportion_ztest", "value_drift_qq",
    "aa_test_null_check",
)


# Names green in CORRECTNESS_r06.json (48 full hash passes) — back of the
# line with the other driver-verified tiers.
_DRIVER_VERIFIED_R6 = (
    "bigram_lm_next_token_accuracy", "brier_decomposition",
    "canary_contamination_scan", "classifier_ece_summary",
    "classifier_eval_card", "coverage_source_selection",
    "cross_source_duplication", "doc_containment_pairs",
    "edit_distance_adjacent", "embedding_alignment_margin",
    "embedding_anisotropy", "embedding_dedup_funnel_e2e",
    "embedding_hubness_topk", "embedding_intrinsic_dimension",
    "fim_transform_census", "fisher_discriminant_ratio",
    "hapax_rate_by_source", "heaps_law_fit", "hybrid_rrf_fusion",
    "incremental_dedup_delta", "incremental_join_maintenance",
    "isotonic_calibration_fit", "kcenter_coreset",
    "label_noise_knn_audit", "minhash_estimate_calibration",
    "mmr_diversified_retrieval", "quantization_recall_eval",
    "rag_retrieval_e2e", "range_window_revenue", "ranker_rbo_agreement",
    "retrieval_ndcg_eval", "rouge_adjacent_overlap",
    "ship_latency_by_priority", "source_quota_sample",
    "source_unigram_kl", "streaming_dedup_events",
    "streaming_heavy_hitters", "streaming_hll_distinct",
    "streaming_session_windows", "streaming_value_drift",
    "subscription_regularity_topk", "threshold_tuning_max_f1",
    "traffic_profile_dow_hour", "unpivot_part_metrics",
    "value_drift_chisq", "value_drift_psi", "video_scene_segments",
    "vocab_zipf_slope",
)

# FRONT of the r07 snapshot prefix (VERDICT r06 items #1/#2/#4): the
# 2-round red row curation_funnel_census (oracle dtype coercion fixed this
# round — outer BIGINT cast), corpus_curation_e2e (green in r05 but its
# near-dedup stage was rewritten in r6, and it shares every stage with the
# red query), all 29 round-6 additions (never driver-checked; includes the
# two dtype-parity latents kendall_tau_value_hour and
# purchase_attribution_time_decay, both fixed this round),
# text_pipeline_e2e (newly given a hash-checked oracle), then the 71
# round-5-tail names with no driver-of-record row in any
# CORRECTNESS_r01–r06.
_TIER1_R7 = (
    "curation_funnel_census", "corpus_curation_e2e",
    "cross_doc_span_removal", "span_dedup_keep_first",
    "eval_span_contamination", "boilerplate_prefix_census",
    "dup_cluster_size_histogram", "truncation_loss_census",
    "token_burstiness_topk", "dup_span_length_histogram",
    "temperature_mixture_weights", "blocklist_filter_census",
    "leakage_free_split_audit", "pq_codebook_profile", "pq_adc_recall",
    "value_drift_psi_weekly", "streaming_stream_static_join",
    "holt_linear_order_forecast", "sql_frontend_recursive_rollup",
    "kendall_tau_value_hour", "seasonal_decomposition_dow",
    "theil_sen_order_trend", "chisq_independence_source_lang",
    "customer_value_lorenz", "graph_adamic_adar_topk",
    "em_linkage_weights", "purchase_attribution_time_decay",
    "markov_removal_attribution", "cuped_adjusted_lift",
    "krippendorff_alpha", "experiment_readout_e2e", "text_pipeline_e2e",
    "benford_first_digit", "mannwhitney_value_by_flag",
    "price_skewness_by_brand", "shipping_survival_curve",
    "order_volume_cusum", "trimmed_mean_price_by_flag",
    "customer_value_gini", "price_mad_robust_scale",
    "asof_nearest_purchase", "hll_accuracy_eval",
    "daily_anomaly_robust_z", "event_trigram_topk",
    "interarrival_exponential_gof", "capture_recapture_estimate",
    "count_overdispersion", "simpsons_paradox_scan", "hill_tail_index",
    "price_elasticity_by_brand", "event_order_inversions",
    "event_entropy_rate", "graph_hits_trade",
    "graph_degree_assortativity", "graph_bfs_distances",
    "graph_rich_club", "token_pmi_pairs", "vocab_coverage_curve",
    "table_profile_lineitem", "snapshot_diff_orders",
    "tfrecord_source_roundtrip", "k_anonymity_audit",
    "deletion_cascade_audit", "heavy_hitters_mg", "l_diversity_audit",
    "bloom_filter_fpr", "t_closeness_audit", "golden_record_survivorship",
    "value_drift_emd", "sliding_distinct_users", "shard_manifest",
    "supplier_bt_strength", "annotator_kappa", "preference_pipeline_e2e",
    "source_loo_value", "mcnemar_model_compare", "compaction_plan",
    "label_centroid_distances", "mixture_token_budget_plan",
    "sample_representativeness_audit", "cohort_did_purchase",
    "dataset_datasheet", "churn_training_frame", "bandit_replay_eval",
    "conformal_coverage_eval", "cv_fold_balance_audit",
    "preference_confound_audit", "crossmodal_integrity_audit",
    "crossmodal_spearman_length_norm", "markov_next_event_accuracy",
    "naive_bayes_source_eval", "knn_shapley_values", "eval_pass_at_k",
    "wilson_lower_bound_ranking", "dsir_effective_sample_size",
    "eval_best_of_k_value", "group_relative_advantage",
    "preference_transitivity_audit", "value_drift_ks",
    "copurchase_recommender_eval", "two_proportion_ztest",
    "value_drift_qq", "aa_test_null_check",
)

# FRONT of the r08 snapshot prefix (VERDICT r07 item #1): the 62 registry
# names with no driver-of-record row in any CORRECTNESS_r01-r07 — this
# round's headline claims first (the three video censuses, ivfpq, rerank,
# foreachbatch-upsert, observed_quality_metrics, sql_pipe_frontend), then
# the r5/r7 tails in registry order. All 62 are green on the judge's
# strict local gate (VERDICT r07: "0 failures / 363 queries"); this tier
# exists purely to convert that local evidence into driver-of-record rows.
_TIER1_R8 = (
    "video_sequence_census", "video_crop_census", "video_inference_census",
    "ivfpq_adc_topk", "retrieval_rerank_topk",
    "streaming_foreachbatch_upsert", "observed_quality_metrics",
    "sql_pipe_frontend", "parquet_schema_evolution",
    "preference_pipeline_e2e", "event_order_inversions",
    "event_entropy_rate", "graph_hits_trade", "graph_degree_assortativity",
    "graph_bfs_distances", "graph_rich_club", "token_pmi_pairs",
    "vocab_coverage_curve", "table_profile_lineitem", "snapshot_diff_orders",
    "tfrecord_source_roundtrip", "k_anonymity_audit",
    "deletion_cascade_audit", "heavy_hitters_mg", "l_diversity_audit",
    "bloom_filter_fpr", "t_closeness_audit", "golden_record_survivorship",
    "value_drift_emd", "sliding_distinct_users", "shard_manifest",
    "supplier_bt_strength", "annotator_kappa", "source_loo_value",
    "mcnemar_model_compare", "compaction_plan", "label_centroid_distances",
    "mixture_token_budget_plan", "sample_representativeness_audit",
    "cohort_did_purchase", "dataset_datasheet", "churn_training_frame",
    "bandit_replay_eval", "conformal_coverage_eval", "cv_fold_balance_audit",
    "preference_confound_audit", "crossmodal_integrity_audit",
    "crossmodal_spearman_length_norm", "markov_next_event_accuracy",
    "naive_bayes_source_eval", "knn_shapley_values", "eval_pass_at_k",
    "wilson_lower_bound_ranking", "dsir_effective_sample_size",
    "eval_best_of_k_value", "group_relative_advantage",
    "preference_transitivity_audit", "value_drift_ks",
    "copurchase_recommender_eval", "two_proportion_ztest", "value_drift_qq",
    "aa_test_null_check",
)

# Every registry name that existed at the r8 rotation rewrite (sorted).
# Anything NOT here and NOT in _TIER1_R8 is a brand-new r8 addition and
# sorts into tier 2, right behind the never-driver-checked tier.
_KNOWN_AT_R8_CLOSE = (
    "aa_test_null_check", "above_nation_average", "acf_user_value",
    "ann_recall_at_k", "ann_topk_bruteforce", "ann_topk_ivf", "ann_topk_lsh",
    "ann_topk_lsh_multiprobe", "annotator_kappa", "approx_distinct_parts",
    "arithmetic_normalize", "array_functions", "asof_last_purchase",
    "asof_nearest_purchase", "audio_energy_windows", "bag_set_ops",
    "bandit_replay_eval", "benford_first_digit",
    "bigram_lm_next_token_accuracy", "blocklist_filter_census",
    "bloom_filter_fpr", "bm25_topk_docs", "boilerplate_prefix_census",
    "bootstrap_mean_ci", "bpe_token_counts", "bpe_train_merges",
    "brier_decomposition", "canary_contamination_scan",
    "capture_recapture_estimate", "chisq_independence_source_lang",
    "churn_training_frame", "classifier_auc_by_group", "classifier_auc_eval",
    "classifier_calibration_bins", "classifier_ece_summary",
    "classifier_eval_card", "cms_bigram_frequencies", "cohort_did_purchase",
    "compaction_plan", "conditional_functions", "conformal_coverage_eval",
    "copurchase_recommender_eval", "corpus_bigram_topk",
    "corpus_curation_e2e", "count_overdispersion",
    "coverage_source_selection", "crop_video_events",
    "cross_doc_span_removal", "cross_source_duplication",
    "crossmodal_integrity_audit", "crossmodal_spearman_length_norm",
    "csv_source_roundtrip", "cube_quantity", "cuped_adjusted_lift",
    "curation_funnel_census", "customer_rfm_segments", "customer_value_gini",
    "customer_value_lorenz", "customers_by_region", "customers_with_orders",
    "customers_without_orders", "cv_fold_balance_audit",
    "daily_anomaly_robust_z", "data_quality_checks", "dataset_datasheet",
    "dataset_fingerprint", "date_functions", "dedup_corpus_summary",
    "dedup_keep_best", "deletion_cascade_audit", "distinct_flag_status",
    "distinct_parts_per_flag", "doc_bigram_lm_nll", "doc_bpe_token_estimate",
    "doc_characteristic_terms", "doc_chunking", "doc_containment_pairs",
    "doc_decontamination", "doc_dup_clusters", "doc_duplicate_spans",
    "doc_exact_dedup", "doc_fingerprint", "doc_lang_id", "doc_line_dedup",
    "doc_minhash_lsh_pairs", "doc_negative_samples",
    "doc_ngram_jaccard_pairs", "doc_normalized_text", "doc_oov_rate",
    "doc_pii_scrub", "doc_pretokenize_census", "doc_quality_classifier",
    "doc_quality_score", "doc_repetition_signals", "doc_simhash",
    "doc_simhash_hamming_pairs", "doc_token_fertility", "doc_token_stats",
    "doc_trigram_interp_nll", "doc_unigram_entropy",
    "dsir_effective_sample_size", "dsir_importance_weights",
    "dup_cluster_size_histogram", "dup_span_length_histogram",
    "edit_distance_adjacent", "em_linkage_weights",
    "embedding_alignment_margin", "embedding_anisotropy",
    "embedding_dedup_funnel_e2e", "embedding_dup_clusters",
    "embedding_gram_matrix", "embedding_hubness_topk",
    "embedding_intrinsic_dimension", "embedding_jl_projection",
    "embedding_norm_by_label", "embedding_quantize_int8",
    "embedding_threshold_pairs", "equidepth_value_histogram",
    "eval_best_of_k_value", "eval_pass_at_k", "eval_span_contamination",
    "event_entropy_rate", "event_funnel", "event_markov_transitions",
    "event_order_inversions", "event_trigram_topk",
    "event_value_fill_forward", "event_value_outliers", "ewma_user_value",
    "experiment_readout_e2e", "filename_extension_filter",
    "filename_extract_label", "fim_transform_census",
    "fisher_discriminant_ratio", "frame_downsample_buckets",
    "full_video_sequences", "fuzzy_name_pairs", "gap_filled_daily_counts",
    "geometric_mean_value", "global_top_orders",
    "golden_record_survivorship", "graph_adamic_adar_topk",
    "graph_bfs_distances", "graph_degree_assortativity",
    "graph_feature_propagation", "graph_hits_trade", "graph_kcore_trade",
    "graph_link_prediction", "graph_local_clustering",
    "graph_lpa_communities", "graph_negative_edge_samples",
    "graph_pagerank_trade", "graph_ppr_region_affinity", "graph_rich_club",
    "graph_triangles_copurchase", "graph_weighted_pagerank",
    "group_relative_advantage", "grouped_split_assignment",
    "grouping_sets_revenue", "hapax_rate_by_source", "hard_negative_mining",
    "hash_bucket_split_counts", "heaps_law_fit", "heavy_hitters_mg",
    "hill_tail_index", "hll_accuracy_eval", "hll_portable_union_distinct",
    "hll_sketch_union_distinct", "holt_linear_order_forecast",
    "hybrid_rrf_fusion", "incremental_agg_maintenance",
    "incremental_dedup_delta", "incremental_join_maintenance",
    "inference_logits", "interarrival_exponential_gof",
    "interval_range_join", "isotonic_calibration_fit", "ivfpq_adc_topk",
    "join_key_skew_report", "json_props_histogram", "jsonl_source_roundtrip",
    "k_anonymity_audit", "kcenter_coreset", "kendall_tau_value_hour",
    "kmeans_cluster_profile", "knn_loo_accuracy", "knn_shapley_values",
    "krippendorff_alpha", "l_diversity_audit", "label_centroid_distances",
    "label_noise_knn_audit", "lang_id_confusion", "lateral_token_positions",
    "leakage_free_split_audit", "length_bucket_batching",
    "linreg_extprice_normal_eq", "mahalanobis_event_outliers",
    "mannwhitney_value_by_flag", "market_basket_rules",
    "markov_next_event_accuracy", "markov_removal_attribution",
    "mcnemar_model_compare", "media_decode_frames", "media_phash_dup_pairs",
    "merge_upsert_orders", "minhash_estimate_calibration",
    "mixture_alpha_weights", "mixture_resample", "mixture_token_budget_plan",
    "mmr_diversified_retrieval", "multimodal_meta",
    "mutual_information_fields", "naive_bayes_source_eval",
    "nation_supplier_hhi", "nested_subset_curve", "observed_quality_metrics",
    "orc_source_roundtrip", "order_cohort_retention", "order_status_set_ops",
    "order_volume_cusum", "outer_join_profile", "overlap_shipping_windows",
    "packed_concat_spans", "parquet_schema_evolution", "part_brand_stats",
    "pca_power_component", "pivot_status_quantity", "pq_adc_recall",
    "pq_codebook_profile", "preference_confound_audit",
    "preference_pipeline_e2e", "preference_transitivity_audit",
    "price_elasticity_by_brand", "price_mad_robust_scale",
    "price_quartiles_ntile", "price_skewness_by_brand", "pricing_summary",
    "purchase_attribution_first_touch", "purchase_attribution_last_touch",
    "purchase_attribution_time_decay", "quality_filter_by_lang",
    "quantity_percentiles", "quantization_recall_eval", "rag_retrieval_e2e",
    "random_split_sizes", "range_window_revenue", "ranker_rbo_agreement",
    "record_linkage_scores", "referential_integrity_audit",
    "regexp_functions", "retrieval_ndcg_eval", "retrieval_rerank_topk",
    "revenue_by_priority", "rolling_median_value", "rollup_quantity",
    "rouge_adjacent_overlap", "running_quantity_by_supplier",
    "salted_join_revenue", "salted_revenue_by_supplier",
    "sample_representativeness_audit", "scd2_point_in_time_join",
    "scd2_priority_history", "seasonal_decomposition_dow",
    "seasonal_dow_anomaly", "semantic_dedup_keep",
    "sequence_packing_summary", "session_window_native",
    "shadow_inference_agreement", "shard_manifest",
    "ship_latency_by_priority", "shipment_gaps", "shipping_survival_curve",
    "shuffle_preserves_multiset", "simpsons_paradox_scan",
    "single_frame_sequences", "skyline_parts", "sliding_distinct_users",
    "sliding_window_stats_paned", "snapshot_diff_orders", "source_loo_value",
    "source_quota_sample", "source_shingle_containment", "source_unigram_kl",
    "span_dedup_keep_first", "sql_frontend_q5",
    "sql_frontend_recursive_rollup", "sql_pipe_frontend",
    "stratified_sample", "streaming_cms_counts", "streaming_dedup_events",
    "streaming_foreachbatch_upsert", "streaming_heavy_hitters",
    "streaming_hll_distinct", "streaming_session_windows",
    "streaming_stream_static_join", "streaming_stream_stream_join",
    "streaming_tumbling_counts", "streaming_value_drift", "string_functions",
    "subscription_regularity_topk", "supplier_bt_strength",
    "supplier_shipped_revenue", "t_closeness_audit",
    "table_profile_lineitem", "temperature_mixture_weights",
    "text_pipeline_e2e", "tfrecord_source_roundtrip",
    "theil_sen_order_trend", "threshold_tuning_max_f1",
    "timestamp_formatting", "token_burstiness_topk", "token_pmi_pairs",
    "top_orders_per_customer", "tpch_q10_returned_items",
    "tpch_q11_important_stock", "tpch_q12_shipping_priority_mode",
    "tpch_q13_customer_distribution", "tpch_q14_promotion_effect",
    "tpch_q15_top_supplier", "tpch_q16_parts_supplier",
    "tpch_q17_small_quantity_revenue", "tpch_q18_large_volume",
    "tpch_q19_discounted_revenue", "tpch_q20_potential_promotion",
    "tpch_q21_waiting_suppliers", "tpch_q22_global_sales_opportunity",
    "tpch_q2_min_cost_supplier", "tpch_q3_shipping_priority",
    "tpch_q4_order_priority", "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping", "tpch_q8_market_share",
    "tpch_q9_product_profit", "traffic_profile_dow_hour",
    "trimmed_mean_price_by_flag", "truncation_loss_census",
    "tumbling_window_stats", "two_proportion_ztest",
    "uniform_sample_exact_k", "unpivot_part_metrics", "url_parsing",
    "user_sessions", "user_sessions_udtf", "user_value_trend",
    "value_drift_chisq", "value_drift_emd", "value_drift_ks",
    "value_drift_psi", "value_drift_psi_weekly", "value_drift_qq",
    "variant_props_stats", "video_crop_census", "video_inference_census",
    "video_pipeline_crop_mode", "video_pipeline_e2e", "video_scene_segments",
    "video_sequence_census", "vocab_coverage_curve", "vocab_token_ids",
    "vocab_zipf_slope", "weighted_doc_sample", "wilson_lower_bound_ranking",
    "zorder_values",
)



def _rotated(mapping: dict) -> dict:
    """Three-tier ordering so the driver's fixed-size snapshot prefix always
    covers the least-driver-verified queries first: (1) _TIER1_R8 — the 62
    names with no driver-of-record row in any CORRECTNESS_r01-r07 (headline
    r7 claims first); (2) brand-new round-8 additions (not in the r8-close
    known-name list); (3) queries already driver-green in some
    CORRECTNESS_r01..r07."""
    tier1 = [k for k in _TIER1_R8 if k in mapping]
    t1 = set(tier1)
    known = set(_KNOWN_AT_R8_CLOSE)
    order = tier1
    order += [k for k in mapping if k not in t1 and k not in known]
    order += [k for k in mapping if k not in t1 and k in known]
    return {k: mapping[k] for k in order}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §7.1 M0): the reference's crop_video mode —
    sliding event-time windows × key, P9 partial-window suppression,
    time-sorted sequence assembly — on /root/testdata/sf0.001."""
    return QUERIES["crop_video_events"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _rotated(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    return _rotated(dict(ORACLES))
