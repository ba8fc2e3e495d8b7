"""Query registry: every implemented operator exposed as a named query
(spark_fn, oracle_sql) pair. ``__spark_entry__.py`` re-exports this."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import (
    affinity,
    media,
    options,
    pii,
    quality,
    retrieval,
    sessions,
    stores,
    text,
    timeseries,
    tpch,
    tpch2,
    tpch3,
    vectors,
)

# name -> (query fn, oracle sql builder or None)
_REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], Callable[[], str] | None]] = {
    # --- session OHLC family (A1/A4, F7-F9, P7, W2/W3) ---
    "hourly_candles": (sessions.q_hourly_candles, sessions.oracle_hourly_candles),
    "stream_candles_twin": (
        sessions.q_stream_candles_twin,
        sessions.oracle_stream_candles_twin,
    ),
    "stream_candles_replay_twin": (
        sessions.q_stream_candles_replay_twin,
        sessions.oracle_stream_candles_replay_twin,
    ),
    "collection_lifecycle_twin": (
        sessions.q_collection_lifecycle_twin,
        sessions.oracle_collection_lifecycle_twin,
    ),
    "daily_sessions": (sessions.q_daily_sessions, sessions.oracle_daily_sessions),
    "weekly_sessions": (sessions.q_weekly_sessions, sessions.oracle_weekly_sessions),
    "monthly_sessions": (sessions.q_monthly_sessions, sessions.oracle_monthly_sessions),
    "candle_returns": (sessions.q_candle_returns, sessions.oracle_candle_returns),
    "candle_resample": (sessions.q_candle_resample, sessions.oracle_candle_resample),
    "ewma_close": (sessions.q_ewma_close, sessions.oracle_ewma_close),
    "realized_vol": (sessions.q_realized_vol, sessions.oracle_realized_vol),
    # --- option OHLC (A5, F1, F4-F6, P5, P8) + derived chain analytics ---
    "option_chain_ohlc": (options.q_option_chain_ohlc, options.oracle_option_chain_ohlc),
    "put_call_ratio": (options.q_put_call_ratio, options.oracle_put_call_ratio),
    "iv_smile": (options.q_iv_smile, options.oracle_iv_smile),
    "max_pain": (options.q_max_pain, options.oracle_max_pain),
    "bs_greeks": (options.q_bs_greeks, options.oracle_bs_greeks),
    "implied_vol": (options.q_implied_vol, options.oracle_implied_vol),
    "pnl_explain": (options.q_pnl_explain, options.oracle_pnl_explain),
    "crr_binomial_price": (
        options.q_crr_binomial_price,
        options.oracle_crr_binomial_price,
    ),
    "american_put_premium": (
        options.q_american_put_premium,
        options.oracle_american_put_premium,
    ),
    "vol_surface_fit": (
        options.q_vol_surface_fit,
        options.oracle_vol_surface_fit,
    ),
    # --- data quality / incremental semantics (W1, T6, S7/S8, A6, A7, K1/K2, A3/O4, P4) ---
    "gap_scan": (quality.q_gap_scan, quality.oracle_gap_scan),
    "gap_summary": (quality.q_gap_summary, quality.oracle_gap_summary),
    "watermark_probe": (quality.q_watermark_probe, quality.oracle_watermark_probe),
    "dedup_latest": (quality.q_dedup_latest, quality.oracle_dedup_latest),
    "stream_dedup_twin": (quality.q_stream_dedup_twin, quality.oracle_stream_dedup_twin),
    "cdc_apply_twin": (quality.q_cdc_apply_twin, quality.oracle_cdc_apply_twin),
    "scd2_history": (quality.q_scd2_history, quality.oracle_scd2_history),
    "bitemporal_probe": (
        quality.q_bitemporal_probe,
        quality.oracle_bitemporal_probe,
    ),
    "insert_if_absent": (quality.q_insert_if_absent, quality.oracle_insert_if_absent),
    "top2_extremes": (quality.q_top2_extremes, quality.oracle_top2_extremes),
    "recent_events": (quality.q_recent_events, quality.oracle_recent_events),
    "user_sessions": (quality.q_user_sessions, quality.oracle_user_sessions),
    "value_percentiles": (quality.q_value_percentiles, quality.oracle_value_percentiles),
    "weighted_median": (
        quality.q_weighted_median,
        quality.oracle_weighted_median,
    ),
    "approx_stats": (quality.q_approx_stats, quality.oracle_approx_stats),
    "asof_attribution": (quality.q_asof_attribution, quality.oracle_asof_attribution),
    "asof_forward_twin": (
        quality.q_asof_forward_twin,
        quality.oracle_asof_forward_twin,
    ),
    "asof_nearest_twin": (
        quality.q_asof_nearest_twin,
        quality.oracle_asof_nearest_twin,
    ),
    "conversion_latency": (quality.q_conversion_latency, quality.oracle_conversion_latency),
    "nearest_click": (quality.q_nearest_click, quality.oracle_nearest_click),
    "activity_heatmap": (quality.q_activity_heatmap, quality.oracle_activity_heatmap),
    "value_histogram": (quality.q_value_histogram, quality.oracle_value_histogram),
    "cohort_pivot": (quality.q_cohort_pivot, quality.oracle_cohort_pivot),
    "cohort_unpivot": (quality.q_cohort_unpivot, quality.oracle_cohort_unpivot),
    "user_churn_sets": (quality.q_user_churn_sets, quality.oracle_user_churn_sets),
    "sliding_activity": (quality.q_sliding_activity, quality.oracle_sliding_activity),
    "props_extract": (quality.q_props_extract, quality.oracle_props_extract),
    "reconcile_counts": (quality.q_reconcile_counts, quality.oracle_reconcile_counts),
    "props_variant": (quality.q_props_variant, quality.oracle_props_variant),
    "null_profile": (quality.q_null_profile, quality.oracle_null_profile),
    "value_drift_psi": (
        quality.q_value_drift_psi,
        quality.oracle_value_drift_psi,
    ),
    "ab_conversion_ztest": (
        quality.q_ab_conversion_ztest,
        quality.oracle_ab_conversion_ztest,
    ),
    "group_advantage": (
        quality.q_group_advantage,
        quality.oracle_group_advantage,
    ),
    "conformal_interval": (
        quality.q_conformal_interval,
        quality.oracle_conformal_interval,
    ),
    "poisson_bootstrap_ci": (
        quality.q_poisson_bootstrap_ci,
        quality.oracle_poisson_bootstrap_ci,
    ),
    "huber_regression": (
        quality.q_huber_regression,
        quality.oracle_huber_regression,
    ),
    "auc_roc": (quality.q_auc_roc, quality.oracle_auc_roc),
    "transition_entropy": (
        quality.q_transition_entropy,
        quality.oracle_transition_entropy,
    ),
    "decayed_engagement": (
        quality.q_decayed_engagement,
        quality.oracle_decayed_engagement,
    ),
    "rolling_median": (quality.q_rolling_median, quality.oracle_rolling_median),
    "candle_ffill": (quality.q_candle_ffill, quality.oracle_candle_ffill),
    "user_overlap": (quality.q_user_overlap, quality.oracle_user_overlap),
    "gap_event_overlap": (quality.q_gap_event_overlap, quality.oracle_gap_event_overlap),
    "funnel_stages": (quality.q_funnel_stages, quality.oracle_funnel_stages),
    "benford_deviation": (quality.q_benford_deviation, quality.oracle_benford_deviation),
    "benford_chisq": (quality.q_benford_chisq, quality.oracle_benford_chisq),
    "lineorder_integrity": (quality.q_lineorder_integrity, quality.oracle_lineorder_integrity),
    "key_skew_report": (quality.q_key_skew_report, quality.oracle_key_skew_report),
    "salted_user_spend": (quality.q_salted_user_spend, quality.oracle_salted_user_spend),
    "hll_users": (quality.q_hll_users, quality.oracle_hll_users),
    "kmv_overlap": (quality.q_kmv_overlap, quality.oracle_kmv_overlap),
    "hll_rolling_users": (quality.q_hll_rolling_users, quality.oracle_hll_rolling_users),
    "ams_f2_skew": (quality.q_ams_f2_skew, quality.oracle_ams_f2_skew),
    "ams_join_size": (quality.q_ams_join_size, quality.oracle_ams_join_size),
    "sketch_store_twin": (quality.q_sketch_store_twin, quality.oracle_sketch_store_twin),
    "small_file_compaction": (
        quality.q_small_file_compaction,
        quality.oracle_small_file_compaction,
    ),
    "agg_ivm_twin": (quality.q_agg_ivm_twin, quality.oracle_agg_ivm_twin),
    "stream_agg_ivm_twin": (
        quality.q_stream_agg_ivm_twin,
        quality.oracle_stream_agg_ivm_twin,
    ),
    "join_ivm_twin": (quality.q_join_ivm_twin, quality.oracle_join_ivm_twin),
    "stream_join_ivm_twin": (
        quality.q_stream_join_ivm_twin,
        quality.oracle_stream_join_ivm_twin,
    ),
    "bloom_file_index": (
        quality.q_bloom_file_index,
        quality.oracle_bloom_file_index,
    ),
    "bloom_index_maintain": (
        quality.q_bloom_index_maintain,
        quality.oracle_bloom_index_maintain,
    ),
    "hist_quantiles": (quality.q_hist_quantiles, quality.oracle_hist_quantiles),
    # --- sketch-store consumers: answers from stored registers only ---
    "hll_week_from_store": (
        stores.q_hll_week_from_store,
        stores.oracle_hll_week_from_store,
    ),
    "cms_topk_from_store": (
        stores.q_cms_topk_from_store,
        stores.oracle_cms_topk_from_store,
    ),
    "cms_store_twin": (
        stores.q_cms_store_twin,
        stores.oracle_cms_store_twin,
    ),
    "cms_store_replay_twin": (
        stores.q_cms_store_replay_twin,
        stores.oracle_cms_store_replay_twin,
    ),
    "hll_cube": (stores.q_hll_cube, stores.oracle_hll_cube),
    "reservoir_sample_store": (
        stores.q_reservoir_sample_store,
        stores.oracle_reservoir_sample_store,
    ),
    "weighted_sample_store": (
        stores.q_weighted_sample_store,
        stores.oracle_weighted_sample_store,
    ),
    "stream_reservoir_twin": (
        stores.q_stream_reservoir_twin,
        stores.oracle_stream_reservoir_twin,
    ),
    "mg_topk_store": (
        stores.q_mg_topk_store,
        stores.oracle_mg_topk_store,
    ),
    "stream_mg_topk_twin": (
        stores.q_stream_mg_topk_twin,
        stores.oracle_stream_mg_topk_twin,
    ),
    "stream_weighted_sample_twin": (
        stores.q_stream_weighted_sample_twin,
        stores.oracle_stream_weighted_sample_twin,
    ),
    "dds_quantile_store": (
        stores.q_dds_quantile_store,
        stores.oracle_dds_quantile_store,
    ),
    "dds_store_stream_twin": (
        stores.q_dds_store_stream_twin,
        stores.oracle_dds_store_stream_twin,
    ),
    "hist_quantile_store": (
        stores.q_hist_quantile_store,
        stores.oracle_hist_quantile_store,
    ),
    "hist_store_stream_twin": (
        stores.q_hist_store_stream_twin,
        stores.oracle_hist_store_stream_twin,
    ),
    "ivf_index_upsert": (
        vectors.q_ivf_index_upsert,
        vectors.oracle_ivf_index_upsert,
    ),
    "ivf_index_recluster": (
        vectors.q_ivf_index_recluster,
        vectors.oracle_ivf_index_recluster,
    ),
    "embedding_drift": (
        vectors.q_embedding_drift,
        vectors.oracle_embedding_drift,
    ),
    "mwu_domain_reweight": (
        text.q_mwu_domain_reweight,
        text.oracle_mwu_domain_reweight,
    ),
    "tokenizer_coverage_drift": (
        text.q_tokenizer_coverage_drift,
        text.oracle_tokenizer_coverage_drift,
    ),
    "mmr_rerank": (vectors.q_mmr_rerank, vectors.oracle_mmr_rerank),
    "minhash_index_upsert": (
        text.q_minhash_index_upsert,
        text.oracle_minhash_index_upsert,
    ),
    # maintenance-only split against the pre-staged artifact; same
    # oracle — maintenance must equal rebuild regardless of staging
    "minhash_index_maintain": (
        text.q_minhash_index_maintain,
        text.oracle_minhash_index_upsert,
    ),
    "bpe_apply_expr": (text.q_bpe_apply_expr, text.oracle_bpe_apply_expr),
    "bigram_perplexity": (
        text.q_bigram_perplexity,
        text.oracle_bigram_perplexity,
    ),
    "fim_transform": (text.q_fim_transform, text.oracle_fim_transform),
    "token_kl_divergence": (
        text.q_token_kl_divergence,
        text.oracle_token_kl_divergence,
    ),
    "readability_score": (
        text.q_readability_score,
        text.oracle_readability_score,
    ),
    "table_expectations": (
        quality.q_table_expectations,
        quality.oracle_table_expectations,
    ),
    # --- generic relational (joins, topk, hash agg) ---
    "pricing_summary": (tpch.q_pricing_summary, tpch.oracle_pricing_summary),
    "top_orders": (tpch.q_top_orders, tpch.oracle_top_orders),
    "region_revenue": (tpch.q_region_revenue, tpch.oracle_region_revenue),
    "segment_activity": (tpch.q_segment_activity, tpch.oracle_segment_activity),
    "sales_rollup": (tpch.q_sales_rollup, tpch.oracle_sales_rollup),
    "inactive_customers": (tpch.q_inactive_customers, tpch.oracle_inactive_customers),
    "active_suppliers": (tpch.q_active_suppliers, tpch.oracle_active_suppliers),
    "rolling_revenue": (tpch.q_rolling_revenue, tpch.oracle_rolling_revenue),
    "pricier_than_brand_avg": (tpch.q_pricier_than_brand_avg, tpch.oracle_pricier_than_brand_avg),
    "price_band_assignment": (tpch.q_price_band_assignment, tpch.oracle_price_band_assignment),
    "salted_segment_activity": (
        tpch.q_salted_segment_activity,
        tpch.oracle_salted_segment_activity,
    ),
    "top_orders_per_segment": (
        tpch.q_top_orders_per_segment,
        tpch.oracle_top_orders_per_segment,
    ),
    "order_lines_profile": (
        tpch.q_order_lines_profile,
        tpch.oracle_order_lines_profile,
    ),
    "price_quartiles": (tpch.q_price_quartiles, tpch.oracle_price_quartiles),
    "sales_cube": (tpch.q_sales_cube, tpch.oracle_sales_cube),
    "rfm_segments": (tpch.q_rfm_segments, tpch.oracle_rfm_segments),
    "order_cadence": (tpch.q_order_cadence, tpch.oracle_order_cadence),
    "hierarchy_rollup": (
        tpch.q_hierarchy_rollup,
        tpch.oracle_hierarchy_rollup,
    ),
    "sales_grouping_sets": (
        tpch.q_sales_grouping_sets,
        tpch.oracle_sales_grouping_sets,
    ),
    "customer_percentile": (tpch.q_customer_percentile, tpch.oracle_customer_percentile),
    # --- r14 rank-arithmetic analytics (plans/tpch3.py) ---
    "order_ntile": (tpch3.q_order_ntile, tpch3.oracle_order_ntile),
    "part_size_rank": (tpch3.q_part_size_rank, tpch3.oracle_part_size_rank),
    "spearman_qty_price": (
        tpch3.q_spearman_qty_price,
        tpch3.oracle_spearman_qty_price,
    ),
    "winsorized_revenue": (
        tpch3.q_winsorized_revenue,
        tpch3.oracle_winsorized_revenue,
    ),
    "iqr_outliers": (tpch3.q_iqr_outliers, tpch3.oracle_iqr_outliers),
    "segment_priority_chisq": (
        tpch3.q_segment_priority_chisq,
        tpch3.oracle_segment_priority_chisq,
    ),
    "mann_whitney_returns": (
        tpch3.q_mann_whitney_returns,
        tpch3.oracle_mann_whitney_returns,
    ),
    "trimmed_mean_revenue": (
        tpch3.q_trimmed_mean_revenue,
        tpch3.oracle_trimmed_mean_revenue,
    ),
    "doc_length_deciles": (
        tpch3.q_doc_length_deciles,
        tpch3.oracle_doc_length_deciles,
    ),
    "ks_returns": (tpch3.q_ks_returns, tpch3.oracle_ks_returns),
    "price_percentile_disc": (
        tpch3.q_price_percentile_disc,
        tpch3.oracle_price_percentile_disc,
    ),
    "supplier_blame": (tpch.q_supplier_blame, tpch.oracle_supplier_blame),
    "order_priority_check": (
        tpch.q_order_priority_check,
        tpch.oracle_order_priority_check,
    ),
    "small_quantity_revenue": (
        tpch.q_small_quantity_revenue,
        tpch.oracle_small_quantity_revenue,
    ),
    "customer_order_counts": (
        tpch.q_customer_order_counts,
        tpch.oracle_customer_order_counts,
    ),
    "large_orders": (tpch.q_large_orders, tpch.oracle_large_orders),
    "sales_opportunity": (tpch.q_sales_opportunity, tpch.oracle_sales_opportunity),
    "promo_revenue": (tpch.q_promo_revenue, tpch.oracle_promo_revenue),
    "priority_shipping": (tpch.q_priority_shipping, tpch.oracle_priority_shipping),
    "nation_trade_volume": (
        tpch.q_nation_trade_volume,
        tpch.oracle_nation_trade_volume,
    ),
    "qty_price_corr": (tpch.q_qty_price_corr, tpch.oracle_qty_price_corr),
    "yoy_revenue": (tpch.q_yoy_revenue, tpch.oracle_yoy_revenue),
    "revenue_contribution": (
        tpch.q_revenue_contribution,
        tpch.oracle_revenue_contribution,
    ),
    "supplier_concentration": (
        tpch.q_supplier_concentration,
        tpch.oracle_supplier_concentration,
    ),
    "shipping_sla": (tpch.q_shipping_sla, tpch.oracle_shipping_sla),
    # --- round-4: remaining TPC-H archetypes (Q2/Q8/Q9/Q10/Q11/Q15/Q16/Q19/Q20) ---
    "revenue_gini": (tpch2.q_revenue_gini, tpch2.oracle_revenue_gini),
    "min_cost_supplier": (tpch2.q_min_cost_supplier, tpch2.oracle_min_cost_supplier),
    "market_share": (tpch2.q_market_share, tpch2.oracle_market_share),
    "product_profit": (tpch2.q_product_profit, tpch2.oracle_product_profit),
    "returned_items": (tpch2.q_returned_items, tpch2.oracle_returned_items),
    "important_parts": (tpch2.q_important_parts, tpch2.oracle_important_parts),
    "top_supplier": (tpch2.q_top_supplier, tpch2.oracle_top_supplier),
    "supplier_part_counts": (
        tpch2.q_supplier_part_counts,
        tpch2.oracle_supplier_part_counts,
    ),
    "disjunctive_revenue": (
        tpch2.q_disjunctive_revenue,
        tpch2.oracle_disjunctive_revenue,
    ),
    "excess_suppliers": (tpch2.q_excess_suppliers, tpch2.oracle_excess_suppliers),
    "weighted_median_price": (
        tpch.q_weighted_median_price,
        tpch.oracle_weighted_median_price,
    ),
    # --- training-data ops: text ---
    "doc_stats": (text.q_doc_stats, text.oracle_doc_stats),
    "text_quality": (text.q_text_quality, text.oracle_text_quality),
    "lang_profile": (text.q_lang_profile, text.oracle_lang_profile),
    "doc_fingerprint": (text.q_fingerprint, text.oracle_fingerprint),
    "exact_dup_groups": (text.q_exact_dup_groups, text.oracle_exact_dup_groups),
    "minhash_near_dups": (text.q_minhash_near_dups, text.oracle_minhash_near_dups),
    "simhash_near_dups": (text.q_simhash_near_dups, text.oracle_simhash_near_dups),
    "ngram_jaccard_pairs": (text.q_ngram_jaccard_pairs, text.oracle_ngram_jaccard_pairs),
    "containment_pairs": (text.q_containment_pairs, text.oracle_containment_pairs),
    "corpus_curation": (text.q_corpus_curation, text.oracle_corpus_curation),
    "dedup_clusters": (text.q_dedup_clusters, text.oracle_dedup_clusters),
    "cluster_survivors": (text.q_cluster_survivors, text.oracle_cluster_survivors),
    "stratified_sample": (text.q_stratified_sample, text.oracle_stratified_sample),
    "token_histogram": (text.q_token_histogram, text.oracle_token_histogram),
    "vocab_top_tokens": (text.q_vocab_top_tokens, text.oracle_vocab_top_tokens),
    "token_heavy_hitters": (
        text.q_token_heavy_hitters,
        text.oracle_token_heavy_hitters,
    ),
    "token_shards": (text.q_token_shards, text.oracle_token_shards),
    "sequence_pack": (text.q_sequence_pack, text.oracle_sequence_pack),
    # distributed composition scan, adjudicated against the SAME oracle
    # as the single-pass fold (the capped_running_scan pattern)
    "sequence_pack_scan": (
        text.q_sequence_pack_scan,
        text.oracle_sequence_pack,
    ),
    "leakage_safe_split": (
        text.q_leakage_safe_split,
        text.oracle_leakage_safe_split,
    ),
    "doc_repetition": (text.q_doc_repetition, text.oracle_doc_repetition),
    "rare_tokens": (text.q_rare_tokens, text.oracle_rare_tokens),
    "doc_chunks": (text.q_doc_chunks, text.oracle_doc_chunks),
    "chunk_dedup": (text.q_chunk_dedup, text.oracle_chunk_dedup),
    "unigram_logprob": (text.q_unigram_logprob, text.oracle_unigram_logprob),
    "train_split": (text.q_train_split, text.oracle_train_split),
    "edit_distance_pairs": (text.q_edit_distance_pairs, text.oracle_edit_distance_pairs),
    "incremental_dedup": (text.q_incremental_dedup, text.oracle_incremental_dedup),
    "bloom_prefilter_dedup": (
        text.q_bloom_prefilter_dedup,
        text.oracle_bloom_prefilter_dedup,
    ),
    "zorder_layout": (tpch2.q_zorder_layout, tpch2.oracle_zorder_layout),
    "hilbert_layout": (tpch2.q_hilbert_layout, tpch2.oracle_hilbert_layout),
    "hilbert_prune_compare": (
        tpch2.q_hilbert_prune_compare,
        tpch2.oracle_hilbert_prune_compare,
    ),
    "hilbert_prune": (tpch2.q_hilbert_prune, tpch2.oracle_hilbert_prune),
    "hilbert_prune_narrow": (
        tpch2.q_hilbert_prune_narrow,
        tpch2.oracle_hilbert_prune_narrow,
    ),
    "hilbert_prune_ranked": (
        tpch2.q_hilbert_prune_ranked,
        tpch2.oracle_hilbert_prune_ranked,
    ),
    "kendall_orders_spend": (
        tpch3.q_kendall_orders_spend,
        tpch3.oracle_kendall_orders_spend,
    ),
    "mann_kendall_revenue": (
        tpch3.q_mann_kendall_revenue,
        tpch3.oracle_mann_kendall_revenue,
    ),
    "km_survival": (tpch3.q_km_survival, tpch3.oracle_km_survival),
    "logrank_segments": (
        tpch3.q_logrank_segments,
        tpch3.oracle_logrank_segments,
    ),
    "theil_sen_revenue": (
        tpch3.q_theil_sen_revenue,
        tpch3.oracle_theil_sen_revenue,
    ),
    "hodges_lehmann_revenue": (
        tpch3.q_hodges_lehmann_revenue,
        tpch3.oracle_hodges_lehmann_revenue,
    ),
    "stratified_logrank": (
        tpch3.q_stratified_logrank,
        tpch3.oracle_stratified_logrank,
    ),
    "aj_next_purchase": (
        tpch3.q_aj_next_purchase,
        tpch3.oracle_aj_next_purchase,
    ),
    "zorder_prune": (tpch2.q_zorder_prune, tpch2.oracle_zorder_prune),
    "zorder_maintain": (
        tpch2.q_zorder_maintain,
        tpch2.oracle_zorder_maintain,
    ),
    "composite_prune": (
        tpch2.q_composite_prune,
        tpch2.oracle_composite_prune,
    ),
    "composite_maintain": (
        tpch2.q_composite_maintain,
        tpch2.oracle_composite_maintain,
    ),
    "pq_ann_topk": (vectors.q_pq_ann_topk, vectors.oracle_pq_ann_topk),
    "ivfadc_topk": (vectors.q_ivfadc_topk, vectors.oracle_ivfadc_topk),
    "cms_token_freq": (text.q_cms_token_freq, text.oracle_cms_token_freq),
    "feature_hash": (text.q_feature_hash, text.oracle_feature_hash),
    "text_normalize": (text.q_text_normalize, text.oracle_text_normalize),
    "quality_calibration": (text.q_quality_calibration, text.oracle_quality_calibration),
    "corpus_report": (text.q_corpus_report, text.oracle_corpus_report),
    "source_overlap": (text.q_source_overlap, text.oracle_source_overlap),
    "snapshot_diff": (text.q_snapshot_diff, text.oracle_snapshot_diff),
    "span_corruption": (text.q_span_corruption, text.oracle_span_corruption),
    "bm25_search": (retrieval.q_bm25_search, retrieval.oracle_bm25_search),
    "retrieval_ndcg": (retrieval.q_retrieval_ndcg, retrieval.oracle_retrieval_ndcg),
    "hybrid_rrf": (retrieval.q_hybrid_rrf, retrieval.oracle_hybrid_rrf),
    "bpe_tokenize": (text.q_bpe_tokenize, text.oracle_bpe_tokenize),
    "domain_mixture": (retrieval.q_domain_mixture, retrieval.oracle_domain_mixture),
    "temperature_mixture": (
        retrieval.q_temperature_mixture,
        retrieval.oracle_temperature_mixture,
    ),
    "logprob_trim": (retrieval.q_logprob_trim, retrieval.oracle_logprob_trim),
    "mixture_resample": (retrieval.q_mixture_resample, retrieval.oracle_mixture_resample),
    "doc_keywords": (retrieval.q_doc_keywords, retrieval.oracle_doc_keywords),
    "pii_scrub": (pii.q_pii_scrub, pii.oracle_pii_scrub),
    "ngram_contamination": (pii.q_ngram_contamination, pii.oracle_ngram_contamination),
    "exact_substring_contamination": (
        pii.q_exact_substring_contamination,
        pii.oracle_exact_substring_contamination,
    ),
    "self_dup_span_mass": (
        pii.q_self_dup_span_mass,
        pii.oracle_self_dup_span_mass,
    ),
    # --- training-data ops: vectors ---
    "ann_cosine_topk": (vectors.q_ann_cosine_topk, vectors.oracle_ann_cosine_topk),
    "embedding_near_dups": (vectors.q_embedding_near_dups, vectors.oracle_embedding_near_dups),
    "ivf_topk": (vectors.q_ivf_topk, vectors.oracle_ivf_topk),
    "ann_recall": (vectors.q_ann_recall, vectors.oracle_ann_recall),
    "embedding_quantize": (vectors.q_embedding_quantize, vectors.oracle_embedding_quantize),
    "kmeans_clusters": (vectors.q_kmeans_clusters, vectors.oracle_kmeans_clusters),
    "semantic_prune": (vectors.q_semantic_prune, vectors.oracle_semantic_prune),
    "label_cohesion": (vectors.q_label_cohesion, vectors.oracle_label_cohesion),
    "rp_reduce": (vectors.q_rp_reduce, vectors.oracle_rp_reduce),
    "curation_decisions": (
        vectors.q_curation_decisions,
        vectors.oracle_curation_decisions,
    ),
    "embedding_covariance": (
        vectors.q_embedding_covariance,
        vectors.oracle_embedding_covariance,
    ),
    # rows-only: eigendecomposition has no SQL oracle (tests/test_pca.py
    # pins the algebraic invariants)
    "pca_project": (vectors.q_pca_project, None),
    # --- round-3 additions: substring dedup, weighted sampling, Markov ---
    "repeated_spans": (text.q_repeated_spans, text.oracle_repeated_spans),
    "frequent_ngrams": (text.q_frequent_ngrams, text.oracle_frequent_ngrams),
    "bpe_pair_counts": (text.q_bpe_pair_counts, text.oracle_bpe_pair_counts),
    "weighted_sample": (text.q_weighted_sample, text.oracle_weighted_sample),
    "tokenizer_fertility": (
        text.q_tokenizer_fertility,
        text.oracle_tokenizer_fertility,
    ),
    "ngram_novelty_decay": (
        text.q_ngram_novelty_decay,
        text.oracle_ngram_novelty_decay,
    ),
    "minhash_lsh_tuning": (
        text.q_minhash_lsh_tuning,
        text.oracle_minhash_lsh_tuning,
    ),
    "calibration_curve": (
        text.q_calibration_curve,
        text.oracle_calibration_curve,
    ),
    "importance_ess": (
        text.q_importance_ess,
        text.oracle_importance_ess,
    ),
    "k_anonymity": (text.q_k_anonymity, text.oracle_k_anonymity),
    "logistic_irls": (text.q_logistic_irls, text.oracle_logistic_irls),
    "kn_bigram_lm": (text.q_kn_bigram_lm, text.oracle_kn_bigram_lm),
    "dpo_pair_build": (text.q_dpo_pair_build, text.oracle_dpo_pair_build),
    "bigram_pmi": (text.q_bigram_pmi, text.oracle_bigram_pmi),
    "length_ks_drift": (text.q_length_ks_drift, text.oracle_length_ks_drift),
    "zipf_fit": (text.q_zipf_fit, text.oracle_zipf_fit),
    "quantile_map_lengths": (
        text.q_quantile_map_lengths,
        text.oracle_quantile_map_lengths,
    ),
    "hard_negatives": (vectors.q_hard_negatives, vectors.oracle_hard_negatives),
    "candle_interpolate": (
        quality.q_candle_interpolate,
        quality.oracle_candle_interpolate,
    ),
    "interval_coverage": (
        quality.q_interval_coverage,
        quality.oracle_interval_coverage,
    ),
    "event_transitions": (
        quality.q_event_transitions,
        quality.oracle_event_transitions,
    ),
    # --- affinity / graph analytics (round 3) ---
    "basket_pairs": (affinity.q_basket_pairs, affinity.oracle_basket_pairs),
    "bradley_terry": (affinity.q_bradley_terry, affinity.oracle_bradley_terry),
    "triangle_count": (affinity.q_triangle_count, affinity.oracle_triangle_count),
    "label_propagation": (
        affinity.q_label_propagation,
        affinity.oracle_label_propagation,
    ),
    "pagerank_parts": (affinity.q_pagerank_parts, affinity.oracle_pagerank_parts),
    "skyline_parts": (tpch.q_skyline_parts, tpch.oracle_skyline_parts),
    "mad_outliers": (quality.q_mad_outliers, quality.oracle_mad_outliers),
    "trailing_spend": (quality.q_trailing_spend, quality.oracle_trailing_spend),
    # --- time-series analytics (drawdown / TWAP / accumulation / clamped fold) ---
    "max_drawdown": (timeseries.q_max_drawdown, timeseries.oracle_max_drawdown),
    "seasonal_decompose": (
        timeseries.q_seasonal_decompose,
        timeseries.oracle_seasonal_decompose,
    ),
    "cusum_changepoint": (
        timeseries.q_cusum_changepoint,
        timeseries.oracle_cusum_changepoint,
    ),
    "kaplan_meier": (
        timeseries.q_kaplan_meier,
        timeseries.oracle_kaplan_meier,
    ),
    "returns_acf": (
        timeseries.q_returns_acf,
        timeseries.oracle_returns_acf,
    ),
    "amihud_illiq": (
        timeseries.q_amihud_illiq,
        timeseries.oracle_amihud_illiq,
    ),
    "min_var_portfolio": (
        timeseries.q_min_var_portfolio,
        timeseries.oracle_min_var_portfolio,
    ),
    "ledoit_wolf_shrinkage": (
        timeseries.q_ledoit_wolf_shrinkage,
        timeseries.oracle_ledoit_wolf_shrinkage,
    ),
    "kalman_local_level": (
        timeseries.q_kalman_local_level,
        timeseries.oracle_kalman_local_level,
    ),
    "drawdown_duration": (
        timeseries.q_drawdown_duration,
        timeseries.oracle_drawdown_duration,
    ),
    "garch_vol": (timeseries.q_garch_vol, timeseries.oracle_garch_vol),
    "var_es_historical": (
        timeseries.q_var_es_historical,
        timeseries.oracle_var_es_historical,
    ),
    "tail_dependence": (
        timeseries.q_tail_dependence,
        timeseries.oracle_tail_dependence,
    ),
    "jump_test": (timeseries.q_jump_test, timeseries.oracle_jump_test),
    "ou_half_life": (
        timeseries.q_ou_half_life,
        timeseries.oracle_ou_half_life,
    ),
    "lead_lag_xcorr": (
        timeseries.q_lead_lag_xcorr,
        timeseries.oracle_lead_lag_xcorr,
    ),
    "hurst_exponent": (
        timeseries.q_hurst_exponent,
        timeseries.oracle_hurst_exponent,
    ),
    "twap": (timeseries.q_twap, timeseries.oracle_twap),
    "cumulative_uniques": (
        timeseries.q_cumulative_uniques,
        timeseries.oracle_cumulative_uniques,
    ),
    "capped_running_sum": (
        timeseries.q_capped_running_sum,
        timeseries.oracle_capped_running_sum,
    ),
    "top_event_paths": (
        timeseries.q_top_event_paths,
        timeseries.oracle_top_event_paths,
    ),
    "user_value_trend": (
        timeseries.q_user_value_trend,
        timeseries.oracle_user_value_trend,
    ),
    "session_pattern_match": (
        timeseries.q_session_pattern_match,
        timeseries.oracle_session_pattern_match,
    ),
    "rolling_beta": (
        timeseries.q_rolling_beta,
        timeseries.oracle_rolling_beta,
    ),
    "user_burstiness": (
        timeseries.q_user_burstiness,
        timeseries.oracle_user_burstiness,
    ),
    "retention_curve": (
        timeseries.q_retention_curve,
        timeseries.oracle_retention_curve,
    ),
    # distributed composition scan, adjudicated against the SAME oracle
    # as the single-pass fold
    "capped_running_scan": (
        timeseries.q_capped_running_scan,
        timeseries.oracle_capped_running_sum,
    ),
    # --- training-data ops: multimodal (mapInPandas over binary payloads) ---
    "media_features": (media.q_media_features, media.oracle_media_features),
    "media_frames": (media.q_media_frames, media.oracle_media_frames),
    "media_dedup": (media.q_media_dedup, media.oracle_media_dedup),
    "media_probe": (media.q_media_probe, media.oracle_media_probe),
    "audio_probe": (media.q_audio_probe, media.oracle_audio_probe),
    "video_probe": (media.q_video_probe, media.oracle_video_probe),
    "media_pcm_stats": (media.q_media_pcm_stats, media.oracle_media_pcm_stats),
    "image_probe": (media.q_image_probe, media.oracle_image_probe),
}


# The driver adjudicates the first ~50 entries of ``queries()`` iteration
# order against the DuckDB oracle.  ``_PRIORITY`` fills that sample window
# with whatever most needs a driver row this round (VERDICT r6 ask #1):
# three section-2 anchors stay pinned as controls, then the round-10 new
# operators (their first driver adjudication), then the queries whose
# code changed this round (importance_ess decimal sqrt-sum, hll_cube
# GROUPING() flags, pca_project golden adjudication, and the merge-sink
# twins affected by _read_target's mergeSchema change), then the round-9
# additions so their driver rows stay fresh.  The tail keeps prior
# rounds' ordering for stable cross-round bench comparison.
_PRIORITY: list[str] = [
    # pinned anchors (sampled every round as controls)
    "daily_sessions",
    "option_chain_ohlc",
    "candle_resample",
    # round-14 OPTIMIZATION round: every query whose plan changed this
    # round (VERDICT r13 ask #4 — promote changed queries while fresh).
    # implied_vol: staged ncdf subtrees (codegen fix); kendall pair:
    # reassembly diet + single-x kernel skip + B=16; composite pair:
    # store-read index/probes; rfm/shipping_sla/logprob_trim:
    # percentile checkpoint policy; the sink-consuming twins cover the
    # upsert_partitioned staging->checkpoint change.
    "implied_vol",
    "composite_maintain",
    "composite_prune",
    "rfm_segments",
    "shipping_sla",
    "logprob_trim",
    "small_file_compaction",
    "zorder_maintain",
    "stream_reservoir_twin",
    "cms_store_twin",
    "dds_store_stream_twin",
    "hist_store_stream_twin",
    "stream_weighted_sample_twin",
    "stream_mg_topk_twin",
    "minhash_index_maintain",
    "ivf_index_upsert",
    "ivf_index_recluster",
    # round-14 extension wave (second session): the Hilbert physical
    # prune + narrow probes (hilbert_prune_compare re-adjudicated
    # after the hm_joint_cells seam extraction) and the distributed
    # exact Kendall family
    "hilbert_prune",
    "hilbert_prune_narrow",
    "hilbert_prune_ranked",
    "kendall_orders_spend",
    "mann_kendall_revenue",
    "km_survival",
    "logrank_segments",
    "theil_sen_revenue",
    "hodges_lehmann_revenue",
    "stratified_logrank",
    "aj_next_purchase",
    # round-14 new queries (first driver adjudication) + changed
    # queries: the grouped-rank re-plan, the min_cost_supplier scan
    # diet, the IVM consume-seam refactor, and the prefixsum/ranks
    # consumers touched by the ADVICE null/NaN fix and the
    # distributed_row_number delegation
    "order_ntile",
    "part_size_rank",
    "spearman_qty_price",
    "winsorized_revenue",
    "iqr_outliers",
    "segment_priority_chisq",
    "mann_whitney_returns",
    "trimmed_mean_revenue",
    "doc_length_deciles",
    "hilbert_layout",
    "hilbert_prune_compare",
    "ks_returns",
    "price_percentile_disc",
    "customer_percentile",
    "min_cost_supplier",
    "cdc_apply_twin",
    "agg_ivm_twin",
    "join_ivm_twin",
    "auc_roc",
    "key_skew_report",
    "retrieval_ndcg",
    "zipf_fit",
    # round-13 changed queries: derived-bounds prefix segmentation +
    # scan diet (quantile family), nearest-predecessor carry prune
    # (rolling), prefix-sum re-route (the two text distributions),
    # parameterized maintain oracle / unconditional layout contract
    # (composite pair), and the apply-seam refactor (every twin whose
    # per-trigger path moved through the new audit seams)
    "weighted_median",
    "conformal_interval",
    "value_percentiles",
    "rolling_median",
    "length_ks_drift",
    "quantile_map_lengths",
    "cms_store_replay_twin",
    "stream_candles_twin",
    "stream_candles_replay_twin",
    "stream_agg_ivm_twin",
    "stream_join_ivm_twin",
    # r13 scans-audit sweep: compact shared frames checkpointed out of
    # multi-branch re-derivation (bradley_terry's MM fixtures, LPA
    # seeds, churn period sets, the overlap matrix aggregate)
    "bradley_terry",
    "label_propagation",
    "user_churn_sets",
    "source_overlap",
    # r13 percentile-funnel sweep: every exact `percentile` aggregate
    # over fact- or corpus-sized input re-planned onto the distinct-
    # value prefix sum (grouped_interp_percentiles)
    "mad_outliers",
    "hist_quantiles",
    # round-12 new operators: keep in the sample window while fresh
    # (VERDICT r12 #5)
    "mg_topk_store",
    # round-12 re-planned queries
    "vocab_top_tokens",
    "cms_topk_from_store",
    "bloom_prefilter_dedup",
    "minhash_index_upsert",
    # round-11 new operators: first driver adjudication this round
    "zorder_prune",
    "reservoir_sample_store",
    "weighted_sample_store",
    "asof_forward_twin",
    "bloom_file_index",
    "bloom_index_maintain",
    "embedding_drift",
    "bitemporal_probe",
    "asof_nearest_twin",
    # round-11 code changes: re-adjudicate under the driver (materialize
    # teardown pattern, compact_partitions split-on-mismatch, DDS
    # overflow guard, exact-substring broadcast drop)
    "dds_quantile_store",
    "exact_substring_contamination",
    # round-10 new operators: first driver adjudication this round
    "ledoit_wolf_shrinkage",
    "mwu_domain_reweight",
    "kalman_local_level",
    "tokenizer_coverage_drift",
    "self_dup_span_mass",
    # round-10 code changes: re-adjudicate under the driver
    "importance_ess",
    "hll_cube",
    "pca_project",
    "sketch_store_twin",
    "stream_dedup_twin",
    "collection_lifecycle_twin",
    # round-9 new operators: second driver pass
    "vol_surface_fit",
    "ou_half_life",
    "lead_lag_xcorr",
    "kn_bigram_lm",
    "dpo_pair_build",
    "garch_vol",
    "var_es_historical",
    "tail_dependence",
    "tokenizer_fertility",
    "ngram_novelty_decay",
    "minhash_lsh_tuning",
    "min_var_portfolio",
    "drawdown_duration",
    "hist_quantile_store",
    "logistic_irls",
    "jump_test",
    "k_anonymity",
    "calibration_curve",
    # round-9 code changes (replay-idempotent CMS store, moving-upsert
    # drained-drop journal): re-adjudicate the affected twins
    # round-8 new operators: second driver pass
    "hll_week_from_store",
    "bpe_apply_expr",
    "crr_binomial_price",
    "bigram_perplexity",
    "temperature_mixture",
    "mmr_rerank",
    "group_advantage",
    "fim_transform",
    "seasonal_decompose",
    "cusum_changepoint",
    "token_kl_divergence",
    "kaplan_meier",
    "american_put_premium",
    "poisson_bootstrap_ci",
    "readability_score",
    "revenue_gini",
    "huber_regression",
    "returns_acf",
    "transition_entropy",
    "amihud_illiq",
    "hurst_exponent",
    # round-8 code changes: re-adjudicate under the driver
    "cms_token_freq",
    "bpe_tokenize",
    # round-7 new operators: keep their driver rows fresh
    "sequence_pack",
    "sequence_pack_scan",
    "leakage_safe_split",
    "zorder_layout",
    "pq_ann_topk",
    "ivfadc_topk",
    "hybrid_rrf",
    "hll_users",
    "kmv_overlap",
    "hll_rolling_users",
    "ams_f2_skew",
    "ams_join_size",
    "feature_hash",
    "pnl_explain",
    # previously driver-green queries, prior rounds' order
    "image_probe",
    "benford_chisq",
    "edit_distance_pairs",
    "containment_pairs",
    "max_pain",
    "put_call_ratio",
    "iv_smile",
    "skyline_parts",
    "trailing_spend",
    "candle_interpolate",
    "interval_coverage",
    "event_transitions",
    "doc_repetition",
    "rare_tokens",
    "doc_chunks",
    "chunk_dedup",
    "unigram_logprob",
    "train_split",
    "incremental_dedup",
    "text_normalize",
    "quality_calibration",
    "corpus_report",
    "snapshot_diff",
    "span_corruption",
    "order_cadence",
    "hierarchy_rollup",
    "sales_grouping_sets",
    "supplier_blame",
    "order_priority_check",
    "nation_trade_volume",
    "qty_price_corr",
    "yoy_revenue",
    "revenue_contribution",
    "supplier_concentration",
    "market_share",
    "top_supplier",
    "excess_suppliers",
    "media_pcm_stats",
    "audio_probe",
    "media_probe",
    "video_probe",
    "media_frames",
    "media_dedup",
    "salted_user_spend",
    "table_expectations",
    "capped_running_scan",
    "capped_running_sum",
    "max_drawdown",
    "twap",
    "cumulative_uniques",
    "top_event_paths",
    "user_value_trend",
    "session_pattern_match",
    "rolling_beta",
    "user_burstiness",
    "retention_curve",
    "ann_recall",
    "embedding_quantize",
    "label_cohesion",
    "rp_reduce",
    "curation_decisions",
    "embedding_covariance",
    "hard_negatives",
    "pagerank_parts",
    "triangle_count",
    "basket_pairs",
    "bm25_search",
    "mixture_resample",
    "domain_mixture",
    "doc_keywords",
    "pii_scrub",
    "ngram_contamination",
    "token_shards",
    "token_heavy_hitters",
    "repeated_spans",
    "frequent_ngrams",
    "bpe_pair_counts",
    "weighted_sample",
    "bigram_pmi",
]


# Queries whose bench cost is ADJUDICATION-HARNESS construction —
# scratch stores, physical layouts, checkpointed streams, replay waves —
# rather than the analytics they adjudicate (VERDICT r12 #4: the
# headline total grew ~28 s/round from these, drowning regressions in
# the ~250 cheap analytics queries).  bench.py splits the headline into
# analytics vs harness subtotals along this tag.  Membership is pinned
# by tests/test_coverage_doc.py: exactly the queries that build scratch
# state (tempfile.mkdtemp in their source) are tagged.
_HARNESS_QUERIES: set[str] = {
    "agg_ivm_twin",
    "bloom_file_index",
    "bloom_index_maintain",
    "cdc_apply_twin",
    "cms_store_replay_twin",
    "cms_store_twin",
    "cms_topk_from_store",
    "collection_lifecycle_twin",
    "composite_maintain",
    "composite_prune",
    "dds_quantile_store",
    "dds_store_stream_twin",
    "hilbert_prune",
    "hist_quantile_store",
    "hist_store_stream_twin",
    "hll_cube",
    "hll_week_from_store",
    "ivf_index_recluster",
    "ivf_index_upsert",
    "join_ivm_twin",
    "mg_topk_store",
    "minhash_index_maintain",
    "minhash_index_upsert",
    "reservoir_sample_store",
    "sketch_store_twin",
    "small_file_compaction",
    "stream_agg_ivm_twin",
    "stream_candles_replay_twin",
    "stream_candles_twin",
    "stream_dedup_twin",
    "stream_join_ivm_twin",
    "stream_mg_topk_twin",
    "stream_reservoir_twin",
    "stream_weighted_sample_twin",
    "weighted_sample_store",
    "zorder_maintain",
    "zorder_prune",
}


def harness_queries() -> set[str]:
    """Names of the adjudication-harness registry queries (see
    ``_HARNESS_QUERIES``)."""
    return set(_HARNESS_QUERIES)


def _ordered_names() -> list[str]:
    promoted = list(
        dict.fromkeys(n for n in _PRIORITY if n in _REGISTRY)
    )  # first mention wins; later duplicates (re-promotions) collapse
    seen = set(promoted)
    return promoted + [n for n in _REGISTRY if n not in seen]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _REGISTRY[name][0] for name in _ordered_names()}


def bench_order() -> list[str]:
    """STABLE bench execution order: pure registration order (the
    ``_REGISTRY`` literal), independent of ``_PRIORITY``.

    VERDICT r14 ask #2: ``queries()`` iteration order drives the
    driver's oracle-sample window, so ``_PRIORITY`` reshuffles it every
    round — but the bench main loop used the same order, which seated
    each round's changed queries at the COLD FRONT of the session
    (where the canary start-sweep shows 2-4× penalties), i.e. the
    round's own changes were always measured at their worst position.
    The bench now runs in this round-invariant order (new queries
    append at the tail); ``_PRIORITY`` continues to drive only the
    oracle sample.  Same name set as ``queries()`` by construction.
    """
    return list(_REGISTRY)


def oracle_sql() -> dict[str, str]:
    return {
        name: _REGISTRY[name][1]()
        for name in _ordered_names()
        if _REGISTRY[name][1] is not None
    }


def _af_sink_compact(spark, sf_dir, scratch):
    from ..sinks.layout import af_sink_compact

    return af_sink_compact(spark, sf_dir, scratch)


def _af_sink_moving_upsert(spark, sf_dir, scratch):
    from ..sinks.upsert import af_sink_moving_upsert

    return af_sink_moving_upsert(spark, sf_dir, scratch)


# Interior-frame audit hooks (VERDICT r11 #3): tempdir-scoped store/
# twin queries return a materialize()d ExistingRDD, so the terminal
# plan audit sees none of their maintenance plans.  Each hook builds
# its minimal store state under a caller-owned scratch dir and returns
# the INTERIOR frames (build / adjust / merge / consume) lazily, for
# tools/plan_audit.py to explain as `query#frame` rows in PLANS.md —
# CI-pinned by tests/test_plan_audit.py's frame sentinels.
_AUDIT_FRAMES: dict[
    str, Callable[[SparkSession, str, str], dict[str, DataFrame]]
] = {
    "zorder_prune": tpch2.af_zorder_prune,
    "composite_prune": tpch2.af_composite_prune,
    "zorder_maintain": tpch2.af_zorder_maintain,
    "reservoir_sample_store": stores.af_reservoir_sample_store,
    "weighted_sample_store": stores.af_weighted_sample_store,
    "stream_reservoir_twin": stores.af_stream_reservoir_twin,
    "mg_topk_store": stores.af_mg_topk_store,
    "hll_week_from_store": stores.af_hll_week_from_store,
    "cms_topk_from_store": stores.af_cms_topk_from_store,
    "hist_quantile_store": stores.af_hist_quantile_store,
    "dds_quantile_store": stores.af_dds_quantile_store,
    "ivf_index_upsert": vectors.af_ivf_index_upsert,
    "minhash_index_maintain": text.af_minhash_index_maintain,
    "stream_weighted_sample_twin": stores.af_stream_weighted_sample_twin,
    # sink-level interior plans (not registry queries): the two shared
    # sinks whose plans were previously only pytest-pinned
    "sink_compact_partitions": _af_sink_compact,
    "sink_moving_upsert": _af_sink_moving_upsert,
    "agg_ivm_twin": quality.af_agg_ivm_twin,
    "join_ivm_twin": quality.af_join_ivm_twin,
    "bloom_index_maintain": quality.af_bloom_index_maintain,
    # r13 (VERDICT r12 #2): per-trigger #apply rows for the remaining
    # streaming twins — the recurring 100 TB cost the terminal audit
    # can't see (the twins resolve to ExistingRDD after materialize())
    "cms_store_replay_twin": stores.af_cms_store_replay_twin,
    "hist_store_stream_twin": stores.af_hist_store_stream_twin,
    "dds_store_stream_twin": stores.af_dds_store_stream_twin,
    "stream_mg_topk_twin": stores.af_stream_mg_topk_twin,
    "stream_candles_replay_twin": sessions.af_stream_candles_replay_twin,
    "stream_agg_ivm_twin": quality.af_stream_agg_ivm_twin,
    "stream_join_ivm_twin": quality.af_stream_join_ivm_twin,
}


def audit_frames() -> dict[
    str, Callable[[SparkSession, str, str], dict[str, DataFrame]]
]:
    return dict(_AUDIT_FRAMES)
