"""Driver contract for the etl-script-spark engine.

``entry(spark)`` runs the flagship pricing-summary query at sf0.001;
``queries()`` exposes every declared operator query from SURVEY.md §2
(implemented in etl_script_spark/plans/catalog.py); ``oracle_sql()``
returns the DuckDB-equivalent SQL for each (queries without an entry
are non-SQL-expressible and get the driver's rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_script_spark.plans.catalog import CATALOG


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return CATALOG["q1_pricing_summary"].spark(spark, "/root/testdata/sf0.001")


# Queries with a GREEN driver CORRECTNESS row, keyed by the round the
# row landed (CORRECTNESS_r0{1..9}.json). The driver samples queries()
# in dict order, so never-checked entries are listed first, then the
# STALEST greens (oldest round first) so early-round operators are
# periodically re-proven instead of never touched again.
# s1_csv_encoding_fallback was re-verified r8 after its r7 schema fix.
_CHECKED_BY_ROUND: dict[int, tuple[str, ...]] = {
    1: (
        "q1_pricing_summary", "q3_shipping_priority",
        "q5_local_supplier_volume", "point_lookup",
        "range_projection", "keep_list_projection",
        "semi_join_exists", "upsert_keyed", "replace_children",
        "nulls_last_pagination", "topk_per_group",
        "union_with_lineage", "p2_fuzzy_canonicalize",
        "p10_strict_mode_filter",
    ),
    2: (
        "a6_last_wins_pivot", "j4_diff_sync_soft_delete",
        "mm_frame_sample", "j_asof_last_purchase",
        "sessionize_events", "j_range_price_bands",
        "j_range_bucketed", "pipeline_dbd_financial_e2e",
        "pipeline_invoice_clean_e2e", "pipeline_sale_report_e2e",
        "r1_unpivot_measures", "r1_unpivot_year_pairs",
        "r2_pivot_event_types", "r3_year_projection",
        "r4_positional_extract", "r5_ffill", "p5_header_row_filter",
        "p6_total_row_filter", "p7_trailing_trim",
        "p9_validation_split", "p9_validation_metrics",
        "p11_noise_label_filter", "p8_drop_all_null",
        "a3_count_and_page", "a4_array_size",
        "a5_ordered_group_stats", "s11_json_pointer",
        "s12_json_roundtrip", "s13_csv_roundtrip",
        "s14_jdbc_batch_roundtrip", "s16_file_meta",
        "s2_excel_roundtrip", "s2_xls_roundtrip",
        "s4_pdf_table_extract", "s5_pdf_text_ocr_cascade",
        "sql_surface_shared", "st_tumbling_window",
        "st_sliding_window", "st_session_window", "st_stream_dedup",
        "st_stream_tumbling", "st_stateful_anomalies",
        "dedup_exact_text", "dedup_ngram_jaccard",
        "dedup_cc_clusters", "dedup_near_canonical",
        "pipeline_llm_prep_e2e",
    ),
    3: (
        "a5_collect_by_year", "a7_exact_percentiles",
        "a8_rollup_revenue", "ann_cosine_topk", "ann_lsh_topk",
        "anomalies_running_mean_jvm", "bucketed_join_zero_shuffle",
        "dedup_cc_alternating", "dedup_ngram_jaccard_char",
        "embedding_near_dups", "f19_token_repairs",
        "j_interval_overlap", "mm_audio_chunks", "mm_image_features",
        "pipeline_remittance_e2e", "s10_rest_bol_fetch",
        "s15_http_push_roundtrip", "s9_scrape_card_parse",
        "sample_hash_deterministic", "skew_salted_join",
        "skew_two_phase_agg", "st_stream_upsert_latest",
        "text_fingerprint", "text_lang_id", "text_lang_id_multi",
        "text_quality_score", "text_token_counts",
        "ts_gap_fill_hourly",
    ),
    4: (
        "q4_order_priority", "q6_forecast_revenue",
        "q10_returned_items", "q14_promo_revenue", "q18_large_orders",
        "q19_brand_quantity_revenue", "q15_top_supplier",
        "q22_dormant_customers", "dedup_minhash_lsh", "dedup_simhash",
        "text_fingerprint_rolling", "ann_ivf_topk",
        "search_bm25_topk", "tok_bpe_roundtrip", "pii_redact_scrub",
        "text_repetition", "decontam_ngram_overlap",
        "sample_stratified_by_source", "url_canonicalize_dedup",
        "text_chunk_windows", "pipeline_curation_e2e",
        "tok_vocab_counts", "text_unigram_nll",
        "corpus_len_histogram", "dedup_incremental_ingest",
        "cluster_kmeans_assign", "text_quality_buckets",
        "pipeline_mm_curation_e2e", "dedup_repeated_spans",
        "pack_training_sequences", "sample_epoch_mix",
        "sample_quality_weighted", "corpus_snapshot_diff",
        "feat_normalize_pipeline", "ev_funnel_conversion",
        "ev_cohort_retention", "ev_value_cube",
        "ev_time_weighted_avg", "pipeline_skew_hot_company_e2e",
        "inc_agg_maintenance", "scd2_dimension_history",
        "fuzzy_name_match", "graph_pagerank",
        "dq_expectations_metrics", "dq_expectations_quarantine",
        "sk_approx_distinct", "sk_hll_mergeable", "sk_heavy_hitters",
        "sk_approx_quantiles",
    ),
    5: (
        "cdc_apply_changes", "chat_flatten_turns",
        "decimal_money_at_rest", "decontam_embedding_neardup",
        "dedup_paragraphs_global", "dedup_semantic_clusters",
        "embedding_quantize_int8", "ev_attribution_last_touch",
        "feat_quantile_binning", "gov_k_anonymity", "graph_kcore",
        "graph_triangle_count", "inc_join_maintenance",
        "layout_compact_small_files", "layout_range_clustered_read",
        "layout_zorder_clustered_read", "link_fellegi_sunter",
        "merge_partition_scoped", "q11_important_stock",
        "q12_shipmode_priority", "q13_customer_distribution",
        "q16_supplier_part_cnt", "q17_small_qty_revenue",
        "q20_part_promotion", "q21_waiting_supplier",
        "q2_min_cost_supplier", "q7_volume_shipping",
        "q8_market_share", "q9_product_profit",
        "quality_gopher_rules", "s17_csv_corrupt_quarantine",
        "s18_orc_roundtrip", "s19_schema_evolution_merge",
        "s20_variant_semistructured", "s21_python_datasource_paged",
        "s22_python_datasource_stream", "s23_jsonl_gz_roundtrip",
        "s24_xml_roundtrip", "sample_diverse_buckets",
        "sample_temperature_mix", "sim_tfidf_cosine_pairs",
        "sk_approx_topk", "sk_bloom_prune_join", "sk_theta_set_ops",
        "st_stream_cdc_apply", "st_stream_static_enrich",
        "st_stream_stream_join", "text_bigram_nll", "ts_ewma_fir",
        "ts_mad_outliers",
    ),
    6: (
        "ann_ivfpq_topk", "augment_mlm_mask",
        "augment_span_corruption", "contrastive_inbatch_negatives",
        "corpus_heaps_law", "corpus_ks_drift", "corpus_psi_drift",
        "corpus_zipf_slope", "curation_dsir_select",
        "curation_token_budget_select", "decontam_bloom_ngram",
        "dedup_keep_best_quality", "dedup_substring_remove",
        "dq_profile_drift", "embedding_pca_rotation",
        "export_train_shards", "extract_html_main_text",
        "inc_agg_join_maintenance", "inc_agg_join_retract",
        "link_fs_em_weights", "mm_binary_simhash_neardup",
        "pipeline_r6_curation_e2e", "quality_nb_classifier",
        "quality_rank_calibration", "rlhf_preference_pairs",
        "s1_encoding_probe_distributed", "s25_fixed_width_roundtrip",
        "sample_exact_per_stratum", "sample_match_length_dist",
        "sample_weighted_gumbel_topk", "search_phrase_positional",
        "st_stream_drift_monitor", "st_stream_neardup_gate",
        "tok_unigram_roundtrip",
    ),
    7: (
        "ann_maxsim_topk", "ann_mutual_knn",
        "curation_soft_dedup_weights", "cust_gini_by_nation",
        "cust_rfm_segments", "dedup_containment_pairs",
        "dedup_continuation_pairs", "dedup_jaccard_prefix_filter",
        "dedup_sentences_global", "diag_key_skew",
        "dq_benford_first_digit", "ev_markov_transitions",
        "ev_top_paths", "feat_hashed_buckets",
        "feat_quantile_normalize", "feat_target_encode_loo",
        "feat_weighted_median", "gov_l_diversity_groups",
        "gov_randomized_response", "gov_source_datacard",
        "gov_t_closeness", "search_autocomplete", "search_rrf_fusion",
        "sim_kcenter_coreset", "split_group_aware",
        "sql_grouping_sets", "sql_null_semantics", "sql_window_suite",
        "stat_chi2_independence", "stat_cohens_kappa",
        "stat_cramers_v", "stat_mannwhitney_u",
        "stat_ols_slope_groups", "stat_randomization_test",
        "stat_roc_auc", "stat_spearman_rho", "text_code_detect",
        "text_kneser_ney_bigrams", "text_novelty_vs_reference",
        "text_pmi_collocations", "text_readability_flesch",
        "text_script_profile", "text_stupid_backoff",
        "text_top_keywords", "text_winnow_fingerprints",
        "tok_fertility_stats", "tok_wordpiece_roundtrip",
        "ts_cusum_changepoints", "ts_ohlc_resample",
        "ts_seasonality_index",
    ),
    8: (
        "augment_token_dropout", "basket_part_pairs_lift",
        "corpus_js_divergence", "curation_batch_budget",
        "curation_curriculum_interleave", "curation_pack_efficiency",
        "dedup_pair_sim_histogram", "dwh_early_fact_retry",
        "ev_attribution_linear", "ev_bot_detect", "ev_diff_in_diff",
        "feat_woe_encoding", "gov_dataset_fingerprint",
        "graph_bfs_hops", "graph_common_neighbors",
        "graph_label_propagation", "hier_flatten_paths",
        "inc_fingerprint_maintenance", "j_asof_tolerance",
        "layout_hilbert_clustered_read", "li_ship_latency_hist",
        "link_sorted_neighborhood", "mm_video_scene_segments",
        "part_abc_by_brand", "pipeline_r7_analytics_report",
        "pipeline_r7_curation_e2e", "pipeline_r7_feature_mart_e2e",
        "s1_csv_encoding_fallback", "scd2_point_in_time_join",
        "search_snippet_window", "search_symspell_suggest",
        "sk_countmin_estimate", "sk_kmv_jaccard", "st_stream_ohlc",
        "st_stream_quota_gate", "stat_bootstrap_ci",
        "stat_brown_forsythe", "stat_cuped_adjust",
        "stat_kendall_tau", "stat_kruskal_wallis",
        "stat_partial_corr", "stat_theil_sen", "stat_trimmed_mean",
        "stat_welch_ttest", "text_char_entropy", "ts_acf_lags",
        "ts_cross_correlation", "ts_linear_interpolate",
        "ts_lttb_downsample", "ts_period_detect",
    ),
    9: (
        "anti_join_missing", "broadcast_enrich_fill",
        "corpus_burstiness", "d3_multipass_text_dedup",
        "dedup_composite_first", "diff_sync_scoped",
        "dq_referential_integrity", "f10_numeric_accounting",
        "f11_numeric_percent", "f12_numeric_locale", "f13_multi_dot",
        "f14_int_if_integral", "f15_zero_coercion", "f16_norm_ws",
        "f17_combining_rejoin", "f18_ocr_tail_repair",
        "f1_buddhist_year", "f20_digit_run", "f21_tax_id",
        "f22_name_split", "f23_range_parse", "f24_null_if_empty",
        "f25_derived_measure", "f26_filename_keys",
        "f27_fixed_cell_broadcast", "f29_strip_dot_zero",
        "f2_excel_serial", "f30_header_field",
        "f31_line_parse_cascade", "f32_two_line_merge",
        "f3_date_cascade", "f4_twelve_to_24h", "f5_swapped_month_day",
        "f6_thai_month", "f7_be_dotted", "f8_dayfirst",
        "f9_numeric_basic", "graph_adamic_adar",
        "insert_dedup_new_rows", "lake_time_travel_read",
        "layout_file_skipping", "s26_avro_roundtrip",
        "st_stream_fingerprint", "stat_cochran_q", "stat_cohens_d",
        "stat_friedman", "stat_levene_mean", "stat_mcnemar",
        "text_oov_rate", "ts_holt_linear",
    ),
}
_CHECKED_ROUND: dict[str, int] = {
    name: rnd for rnd, names in _CHECKED_BY_ROUND.items() for name in names
}
_CHECKED = frozenset(_CHECKED_ROUND)


def _ordered() -> list[str]:
    names = list(CATALOG)
    unchecked = [n for n in names if n not in _CHECKED]
    stalest_first = sorted(
        (n for n in names if n in _CHECKED),
        key=lambda n: (_CHECKED_ROUND[n], n),
    )
    return unchecked + stalest_first


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: CATALOG[name].spark for name in _ordered()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each declared query."""
    return {
        name: CATALOG[name].oracle
        for name in _ordered()
        if CATALOG[name].oracle is not None
    }
