"""Query registry — the ONE place the inventory's identity lives.

``QUERIES`` / ``ORACLES`` are populated by the ``@query`` decorator as the
part modules (q01..q06, imported in order by ``__init__``) define their
entries. ``REGISTRY_ORDER`` is the EXPLICIT definition-order snapshot taken
at the round-13 package split: the driver hashes the first 50 names of
``ordered_queries()`` for its correctness rotation, so the relative order of
existing queries is part of the external contract. ``validate_order`` (called
at package import) asserts the known names still appear in exactly this
order — an accidental part reshuffle fails the import, not a driver round.

New queries register by decorator as always and do NOT need a
REGISTRY_ORDER entry (they slot into definition order after their part's
existing names; only the frozen names' relative order is pinned).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from dawis_spark.catalog import register_testdata

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            register_testdata(spark, sf_dir)
            return fn(spark, sf_dir)

        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped

    return deco


# Definition order at the r13 split — the frozen relative order of the
# 365 pre-split queries (see module docstring).
REGISTRY_ORDER: list[str] = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "match_enrichment",
    "comparison_checks",
    "alerts_per_line",
    "prev_period_day",
    "latest_event_per_user",
    "change_detection",
    "duplicate_detection",
    "customers_without_orders",
    "top_parts_per_brand",
    "union_dedup",
    "set_except",
    "sql_params_date_days_ago",
    "column_mapping_nested",
    "sessionization",
    "tumbling_window_agg",
    "dedup_exact",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "ngram_jaccard_topk",
    "simhash_docs",
    "embedding_topk",
    "embedding_ann_lsh",
    "embedding_ann_lsh_multiprobe",
    "kmeans_clusters",
    "language_id",
    "quality_scores",
    "token_counts",
    "doc_fingerprints",
    "rollup_acctbal",
    "pivot_event_counts",
    "percentiles_by_type",
    "cumulative_user_value",
    "above_brand_avg_price",
    "distinct_users_by_type",
    "customer_order_distribution",
    "embedding_ann_ivf",
    "embedding_ann_ivf_trained",
    "q7_nation_trade",
    "q12_priority_buckets",
    "q13_customer_distribution",
    "q14_category_share",
    "q19_disjunctive_filter",
    "q22_idle_customers",
    "funnel_view_click_purchase",
    "weekly_retention_cohorts",
    "sliding_window_agg",
    "embedding_near_dups",
    "psi_metric_extraction",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q15_top_supplier",
    "q17_small_quantity",
    "q18_large_orders",
    "q21_sole_blame_supplier",
    "events_following_1h",
    "vocab_top_tokens",
    "doc_packing_shards",
    "benchmark_contamination",
    "dataset_split",
    "stratified_sample_docs",
    "duplicate_clusters",
    "dedup_keep_canonical",
    "repetition_signals",
    "c4_line_quality",
    "tfidf_top_terms",
    "bm25_search",
    "cdc_chunk_dedup",
    "qlm_dirichlet_search",
    "pii_redaction",
    "asof_last_click",
    "hypertable_rollup",
    "incremental_rollup_2ticks",
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q16_supplier_relationship",
    "q20_excess_shippers",
    "ann_recall_lsh",
    "join_key_skew_profile",
    "salted_skew_join",
    "ann_recall_lsh_multiprobe",
    "chunk_documents",
    "corpus_filter_pipeline",
    "source_quality_rollup",
    "duplicate_detection_parity",
    "duplicate_groups_hot_key",
    "embedding_pq_codes",
    "embedding_ann_pq",
    "embedding_ann_ivfadc",
    "embedding_ann_ivfpq",
    "ann_recall_pq",
    "ann_recall_ivfadc",
    "session_window_agg",
    "source_mixture_weights",
    "url_canonical_dedup",
    "semantic_dedup",
    "embedding_filtered_topk",
    "embedding_filtered_ann_ivf",
    "ann_recall_filtered_ivf",
    "kmv_distinct_users",
    "cm_heavy_hitters",
    "kmv_shingle_overlap",
    "prefix_filter_similar",
    "ann_recall_matryoshka",
    "scd2_dimension_load",
    "scd2_asof_read",
    "mixture_sampled_corpus",
    "coordinated_sample_join",
    "quality_classifier_scores",
    "sampled_quantiles",
    "quantiles_error_eval",
    "textrank_keywords",
    "ppmi_top_axis",
    "pagerank_top_nodes",
    "embedding_ann_sq8",
    "ann_recall_sq8",
    "bloom_semi_join",
    "embedding_ann_refined",
    "ann_recall_refined",
    "anomaly_mad_daily",
    "gapfill_daily_user_value",
    "duplicated_spans",
    "dsir_importance_weights",
    "phrase_search",
    "pmi_collocations",
    "dq_integrity_checks",
    "source_js_divergence",
    "token_entropy",
    "kmeans_cohesion",
    "trend_slopes",
    "anomaly_seasonal_daily",
    "incremental_join_2ticks",
    "null_safe_join_semantics",
    "unpivot_metric_long",
    "not_in_null_semantics",
    "dedup_masked_text",
    "embedding_ann_nsw",
    "ann_recall_nsw",
    "perplexity_quality_bands",
    "embedding_ann_bq",
    "ann_recall_bq",
    "bpe_learned_merges",
    "bpe_segmented_corpus",
    "hybrid_search_rrf",
    "logreg_weights",
    "classifier_auc_eval",
    "knn_label_propagation",
    "label_propagation_accuracy",
    "mmr_rerank",
    "mmr_diversity_eval",
    "pps_weighted_sample",
    "pps_ht_totals",
    "hll_distinct_events",
    "funnel_conversion",
    "cohort_retention",
    "event_transitions",
    "gapfill_interp_user_value",
    "position_attribution",
    "frequent_event_sequences",
    "column_stats_profile",
    "feature_correlations",
    "item_cooccurrence_topk",
    "containment_near_dups",
    "coreset_cluster_balanced",
    "item_graph_triangles",
    "fuzzy_name_matches",
    "snapshot_table_diff",
    "totalprice_histogram",
    "session_entry_exit_bounce",
    "ks_price_drift",
    "benford_first_digit",
    "curriculum_buckets",
    "stratified_quota_sample",
    "dedup_loss_weights",
    "association_rules",
    "rolling_median_7d",
    "pareto_customers",
    "symspell_name_matches",
    "rolling_wau_7d",
    "table_fingerprints",
    "iqr_outlier_fences",
    "sorted_neighborhood_matches",
    "ctr_wilson_ranking",
    "cusum_changepoints",
    "dow_seasonality_index",
    "time_to_conversion",
    "gini_concentration",
    "new_vs_returning_daily",
    "rfm_segments",
    "transition_dwell_times",
    "wordpiece_vocab",
    "wordpiece_segmented_corpus",
    "part_supplier_hhi",
    "lexical_richness_by_source",
    "burrows_delta_sources",
    "theil_sen_trends",
    "mann_whitney_drift",
    "chi_square_independence",
    "embedding_ann_jl",
    "ann_recall_jl",
    "langid_confusion_matrix",
    "proportion_ztest",
    "langid_cohens_kappa",
    "rank_biased_overlap",
    "oph_minhash_pairs",
    "lsh_detection_curve",
    "bootstrap_ci_order_value",
    "pareto_frontier_parts",
    "ewma_daily_smoothing",
    "contrastive_negative_pairs",
    "personalized_pagerank",
    "hits_hub_authority",
    "markov_next_event_accuracy",
    "stl_decomposition_daily",
    "classifier_calibration_curve",
    "source_embedding_affinity",
    "kcore_trade_graph",
    "bfs_hop_distribution",
    "spearman_daily_rev_orders",
    "kendall_daily_rev_orders",
    "acf_daily_revenue",
    "holt_linear_forecast",
    "k_anonymity_customers",
    "ivf_nprobe_recall_curve",
    "search_mrr_eval",
    "weighted_median_price",
    "community_detection_lpa",
    "hampel_outliers_daily",
    "trimmed_mean_price",
    "bellman_ford_fastest_supply",
    "ccf_orders_vs_revenue",
    "rake_keyphrases",
    "winsorized_mean_price",
    "search_ndcg_eval",
    "line_dedup_boilerplate",
    "kmv_set_algebra",
    "tokenizer_fertility_eval",
    "nearest_centroid_accuracy",
    "epoch_shuffle_order",
    "zipf_exponent_fit",
    "token_burstiness_topk",
    "cm_join_size_estimate",
    "weighted_sample_without_replacement",
    "seasonal_naive_mase",
    "l_diversity_profile",
    "fd_confidence_profile",
    "session_gap_curve",
    "split_leakage_neardups",
    "hll_union_events",
    "fellegi_sunter_patterns",
    "fellegi_sunter_em",
    "cs_heavy_hitters",
    "hll_distinct_users_by_type",
    "kaplan_meier_retention",
    "logrank_first_event_groups",
    "shapley_channel_attribution",
    "t_closeness_profile",
    "whale_guarded_transitions",
    "ljung_box_daily_revenue",
    "ols_price_regression",
    "kde_totalprice_density",
    "decision_stump_discount",
    "naive_bayes_langid",
    "fdr_bh_nation_urgency",
    "welch_ttest_order_value",
    "anova_order_value_priority",
    "categorical_association_profile",
    "naive_bayes_cv_folds",
    "pca_top_component",
    "isotonic_urgency_by_value",
    "cuped_adjusted_arm_means",
    "diff_in_diff_region_value",
    "eb_shrunk_urgent_rates",
    "holt_winters_forecast",
    "cube_revenue_flag_status",
    "holt_backtest_mae",
    "theta_method_forecast",
    "croston_intermittent_demand",
    "periodogram_daily_revenue",
    "matrix_profile_daily",
    "forecast_model_mase",
    "mann_kendall_daily_revenue",
    "granger_orders_to_revenue",
    "heaps_law_vocab_growth",
    "kmeans_silhouette_simplified",
    "overdispersion_event_counts",
    "median_ci_order_value",
    "permutation_test_order_value",
    "markov_stationary_distribution",
    "jackknife_urgent_ratio",
    "chao1_vocab_estimate",
    "psi_value_drift",
    "cochran_armitage_trend",
    "markov_removal_attribution",
    "conformal_interval_price",
    "ece_classifier_calibration",
    "platt_recalibrated_ece",
    "gains_lift_deciles",
    "runs_test_daily_revenue",
    "mcnemar_langid_vs_nb",
    "kruskal_wallis_priority",
    "brown_forsythe_priority",
    "effect_sizes_urgent_vs_low",
    "g_test_independence_dow",
    "linear_attribution",
    "time_decay_attribution",
    "nelson_aalen_hazard",
    "hosmer_lemeshow_classifier",
    "ks_statistic_classifier",
    "mutual_info_feature_rank",
    "ar2_forecast_daily",
    "esd_outliers_daily",
    "binseg_changepoints_daily",
    "flesch_reading_ease",
    "leave_one_source_out_vocab",
    "search_map_eval",
    "mixture_temperature_weights",
    "mcc_classifier_confusion",
    "dup_rate_by_source",
    "global_clustering_coefficient",
    "degree_assortativity_items",
    "embedding_isotropy_profile",
    "grid_dbscan_clusters",
    "embedding_norm_profile",
    "cramer_von_mises_drift",
    "anderson_darling_priorities",
    "wasserstein_price_drift",
    "hellinger_tvd_drift",
    "friedman_event_types",
    "spc_xbar_breaches",
    "msprt_sequential_monitor",
    "ab_power_curve",
    "inclusion_dependency_profile",
    "ipw_treatment_effect",
    "aipw_doubly_robust",
    "propensity_stratified_ate",
    "cronbach_alpha_embedding",
    "iv_wald_estimate",
    "huber_irls_regression",
    "mediation_baron_kenny",
    "raking_ipf_weights",
    "regression_discontinuity_spend",
    "ucb1_replay_daily",
    "lexrank_top_sentences",
    "bca_ci_order_value",
    "quantile_treatment_effects",
    "plsa_topic_terms",
    "ltv_projection_curve",
    "cross_source_perplexity",
]

_REGISTRY_SET = frozenset(REGISTRY_ORDER)


def validate_order(queries: dict) -> None:
    """Raise if the frozen names' relative definition order drifted."""
    got = [n for n in queries if n in _REGISTRY_SET]
    if got != REGISTRY_ORDER:
        for i, (a, b) in enumerate(zip(got, REGISTRY_ORDER)):
            if a != b:
                raise ImportError(
                    f"query registry order drifted at position {i}: "
                    f"{a!r} != expected {b!r} — the part-module split must "
                    "preserve definition order (see REGISTRY_ORDER)"
                )
        raise ImportError(
            f"query registry lost entries: {len(got)} != "
            f"{len(REGISTRY_ORDER)}"
        )


DRIVER_PRIORITY: list[str] = [
    # r14 rotation (VERDICT r13 ask #1: drive the never-driver-checked
    # set to ZERO). Seated in order: (a) the 16 r13 NEXT_ROTATION
    # entries, FIRST, as promised there; (b) the 21 r12 second-session
    # queries no CORRECTNESS file has ever hashed; (c) the 12 new r14
    # queries; (d) srm_cumulative_watch, the streaming SRM monitor's
    # oracle-backed batch twin (also new this round). 16+21+13 = 50
    # slots; the union of CORRECTNESS_r01..r14 then covers the whole
    # inventory. (The r14 equi-depth bucket change gets its evidence
    # from SWEEP_r14 + the builder's sf0.1 EDF-family oracle run —
    # results are bit-identical by construction.)
    #
    # -- (a) the r13 NEXT_ROTATION sixteen --
    "frequent_event_sequences",  # r11-driver-green; r12 output change never hashed
    "whale_guarded_transitions",  # r11-driver-green; r12 audit-row fix never hashed
    "null_safe_join_semantics",
    "unpivot_metric_long",
    "ab_power_curve",
    "ltv_projection_curve",
    "randomized_response_estimate",
    "negative_binomial_fit",
    "pass_at_k_estimate",
    "self_bleu_diversity",
    "capture_recapture_distinct",
    "dp_noisy_histogram",
    "good_turing_unseen_mass",
    "ngram_novelty_rate",
    "pr_curve_classifier",
    "hurst_rescaled_range",
    # -- (b) the never-driver-checked r12 tail --
    "ar2_forecast_daily",
    "binseg_changepoints_daily",
    "brown_forsythe_priority",
    "kruskal_wallis_priority",
    "effect_sizes_urgent_vs_low",
    "hosmer_lemeshow_classifier",
    "mcc_classifier_confusion",
    "search_map_eval",
    "linear_attribution",
    "time_decay_attribution",
    "nelson_aalen_hazard",
    "flesch_reading_ease",
    "leave_one_source_out_vocab",
    "mixture_temperature_weights",
    "mutual_info_feature_rank",
    "g_test_independence_dow",
    "dup_rate_by_source",
    "esd_outliers_daily",
    "embedding_norm_profile",
    "degree_assortativity_items",
    "global_clustering_coefficient",
    # -- (c) new in r14 (queries/q07_round14_tail.py) --
    "jonckheere_terpstra_priority",
    "hill_tail_index",
    "turning_points_test",
    "adf_unit_root_daily",
    "pacf_daily_revenue",
    "spectral_entropy_daily",
    "tost_equivalence_value",
    "delta_method_ratio_ci",
    "aa_calibration_fpr",
    "context_truncation_loss",
    "region_trade_modularity",
    "classifier_fairness_gaps",
    # -- (d) the streaming SRM monitor's oracle-backed batch twin --
    "srm_cumulative_watch",
]

# r14 leaves no overflow: every query the driver has never hashed fits
# in this round's 50 slots (the whole-inventory SWEEP_r14.json is the
# same-round full-coverage artifact as always).
NEXT_ROTATION: list[str] = []


def ordered_queries() -> dict:
    """QUERIES with DRIVER_PRIORITY first, the rest in definition order."""
    out = {n: QUERIES[n] for n in DRIVER_PRIORITY}
    out.update({n: f for n, f in QUERIES.items() if n not in out})
    return out


def ordered_oracles() -> dict:
    return {n: ORACLES[n] for n in ordered_queries() if n in ORACLES}
