"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``marketdb_spark.queries`` (one module per operator
family, SURVEY.md §2B); this file just exposes the registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from marketdb_spark.queries import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q1-shaped pricing
    summary (scan → filter → grouped exact aggregation)."""
    return REGISTRY["q01_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


# Names that already have driver-green CORRECTNESS rows (rounds 1-3; see
# CORRECTNESS_r01/r02/r03.json). The driver truncates its per-round check to 50
# entries, so never-checked queries are ordered FIRST to earn their rows;
# proven ones rotate to the back — they remain on record in earlier
# CORRECTNESS files and in the local full-registry oracle suite
# (tests/test_oracle.py).
_DRIVER_CHECKED_R01_R02 = frozenset({
    "q01_pricing_summary", "q06_forecast_revenue", "agg_distinct_counts",
    "agg_rollup_priority", "agg_cube_flags", "agg_grouping_sets",
    "agg_collect_ordered", "agg_quantiles", "agg_approx_distinct",
    "agg_minmax_by", "sample_stratified_det", "unpivot_lineitem_metrics",
    "agg_salted_two_phase", "q03_shipping_priority",
    "q05_local_supplier_volume", "q10_returned_items", "join_dim_enrich",
    "join_semi_active_customers", "join_anti_inactive_customers",
    "join_outer_nation_customers", "join_correlated_avg", "q18_large_orders",
    "join_point_in_interval", "join_full_outer_nation_profile",
    "join_nonequi_balance_pairs", "join_range_price_band", "q02_best_supplier",
    "q07_volume_shipping", "q08_market_share", "q09_product_profit",
    "q11_important_stock", "q12_priority_lines", "q13_customer_distribution",
    "q14_promo_revenue", "q15_top_supplier", "q16_supplier_count",
    "q17_small_quantity_revenue", "q19_discounted_revenue",
    "q20_promo_suppliers", "q21_sole_supplier_waits",
    "q22_global_sales_opportunity", "win_topk_orders_per_customer",
    "win_rank_dense_ntile", "win_running_total", "win_lag_lead_price",
    "win_cume_percent", "win_moving_avg", "win_first_last_range",
    "set_union_all_parties", "set_intersect_keys",
})

# Round-3 window (CORRECTNESS_r03.json): all 50 green. With these rotated to
# the back, the never-checked block — the 21 queries left from rounds 1-3
# (scalar family, except/dropdup set ops, UDTF/UDAF, win_range_frame,
# sort_global_topk, join_salted_hotkey, text_bigram_counts,
# embed_random_projection) plus the 8 added in round 4
# (stream_restart_recovery, store_zorder_scan, embed_kmeans_clusters,
# ts_resample_ffill, ts_ewma, ts_zscore_outliers, agg_bitmap_distinct,
# join_range_cells) — sorts inside the driver's 50-entry check window this
# round (29 < 50).
_DRIVER_CHECKED_R03 = frozenset({
    "sim_cosine_topk", "sim_norm_stats", "sim_bucket_topk", "sim_ivf_topk",
    "sim_lsh_buckets", "mm_decode_features", "mm_meta_stats", "mm_audio_meta",
    "stream_tumbling_hourly", "stream_asof_enrich", "stream_interval_join",
    "stream_session_windows", "stream_dedup_union", "stream_ohlc_bars",
    "pipeline_clean_corpus", "dedup_exact_docs", "dedup_ngram_jaccard",
    "dedup_minhash_pairs", "dedup_verified_pairs", "dedup_cluster_docs",
    "dedup_simhash", "dedup_embedding_pairs", "dedup_canonical_docs",
    "dedup_contamination", "doc_text_stats", "doc_token_totals",
    "doc_language_id", "doc_fingerprint", "doc_vocab_topwords",
    "doc_pii_redact", "doc_length_histogram", "doc_token_bpe_est",
    "doc_quality_score", "doc_pack_sequences", "doc_repetition_ratio",
    "doc_winnow_fingerprints", "doc_tfidf_topterms", "doc_chunk_overlap",
    "ts_scan_series", "ts_merge_series", "ts_asof_join", "ts_asof_forward",
    "ts_ohlc_hourly", "ts_interval_days", "ts_session_gaps",
    "ts_tumbling_window", "ts_ohlc_daily_rollup", "ts_asof_tolerance",
    "ts_similarity_paa", "udf_pandas_lcg_buckets",
})

# Round-4 window (CORRECTNESS_r04.json): all 50 checked — 49 green plus
# agg_approx_distinct's by-design rows-only row. This was the last batch of
# never-checked names; every registered query now has at least one driver
# row, so new round-5 queries sort alone at the front of the window.
_DRIVER_CHECKED_R04 = frozenset({
    "agg_approx_distinct", "agg_bitmap_distinct", "agg_collect_ordered",
    "agg_cube_flags", "agg_distinct_counts", "agg_grouping_sets",
    "agg_minmax_by", "agg_quantiles", "agg_rollup_priority",
    "agg_salted_two_phase", "embed_kmeans_clusters", "embed_random_projection",
    "join_anti_inactive_customers", "join_dim_enrich",
    "join_outer_nation_customers", "join_range_cells", "join_salted_hotkey",
    "join_semi_active_customers", "json_props_extract", "pivot_status_by_flag",
    "q01_pricing_summary", "q03_shipping_priority", "q04_order_priority",
    "q05_local_supplier_volume", "q06_forecast_revenue", "q10_returned_items",
    "sample_stratified_det", "scalar_array_map_funcs", "scalar_bitwise_funcs",
    "scalar_datetime_funcs", "scalar_hash_funcs", "scalar_math_conditional",
    "scalar_string_funcs", "set_dropdup_events", "set_except_all_keys",
    "set_except_keys", "set_intersect_all_keys", "sort_global_topk",
    "stats_moments", "store_zorder_scan", "stream_restart_recovery",
    "text_bigram_counts", "ts_autocorr_lag1", "ts_ewma", "ts_resample_ffill",
    "ts_zscore_outliers", "udaf_weighted_avg_price", "udtf_text_parts",
    "unpivot_lineitem_metrics", "win_range_frame",
})

# Queries whose CONTRACT changed in round 5 (new or rewritten oracle):
# their old driver rows no longer attest the current form, so they re-enter
# the check window. agg_approx_distinct: rows-only HLL → exact-count +
# 3·rsd-bound oracle (first oracle-checked row ever for this name).
_RECHECK_R05 = frozenset({"agg_approx_distinct"})

# Round-5 window (CORRECTNESS_r05.json): all 50 green — including the
# re-checked agg_approx_distinct under its new exact+bound oracle. With this
# batch rotated to the back, every one of the 162 registered queries has a
# driver-green row, so queries added in round 6 sort alone at the front.
_DRIVER_CHECKED_R05 = frozenset({
    "agg_approx_distinct", "agg_approx_quantiles", "agg_bitmap_distinct",
    "agg_collect_ordered", "agg_countmin_freq", "agg_cube_flags",
    "agg_distinct_counts", "agg_grouping_sets", "agg_heavy_hitters",
    "agg_minmax_by", "agg_mode_deterministic", "agg_quantiles",
    "agg_rollup_priority", "agg_salted_two_phase", "corpus_mixture_weights",
    "dedup_cluster_chain", "dedup_containment", "dedup_edit_distance",
    "dedup_incremental_exact", "dedup_simhash_pairs", "embed_quantize_int8",
    "join_dim_enrich", "join_interval_overlap", "mm_arrow_features",
    "mm_frame_sample", "q01_pricing_summary", "q03_shipping_priority",
    "q05_local_supplier_volume", "q06_forecast_revenue", "q10_returned_items",
    "sample_stratified_det", "store_bucketed_join", "store_compact_retention",
    "store_deltalog_scan", "store_merge_upsert", "store_rtszip_scan",
    "store_snapshot_scan", "stream_sliding_windows", "stream_snapshot_ingest",
    "stream_stateful_fold", "stream_static_enrich", "ts_asof_nearest",
    "ts_corr_series", "ts_linreg_trend", "ts_resample_interp",
    "ts_vwap_hourly", "udf_cogrouped_funnel", "udf_grouped_minmax_scale",
    "unpivot_lineitem_metrics", "win_gaps_islands",
})

# Round-6 window (CORRECTNESS_r06.json): all 50 green — including every one
# of the 19 queries added in round 6. With this batch rotated to the back,
# all 181 registered queries have driver-green rows, so queries added in
# round 7 sort alone at the front of the window.
_DRIVER_CHECKED_R06 = frozenset({
    "agg_approx_distinct", "agg_approx_quantiles", "agg_bitmap_distinct",
    "agg_collect_ordered", "agg_countmin_freq", "agg_cube_flags",
    "agg_distinct_counts", "agg_funnel_conversion", "agg_grouping_sets",
    "agg_heavy_hitters", "agg_minmax_by", "agg_mode_deterministic",
    "agg_quantiles", "agg_rollup_priority", "agg_salted_two_phase",
    "agg_sketch_merge", "corpus_shard_assign", "corpus_token_budget",
    "dedup_semantic_pairs", "dedup_source_matrix", "doc_domain_caps",
    "graph_pagerank_dedup", "join_anti_inactive_customers",
    "join_correlated_avg", "join_dim_enrich",
    "join_full_outer_nation_profile", "join_nonequi_balance_pairs",
    "join_outer_nation_customers", "join_point_in_interval",
    "join_range_price_band", "join_runtime_filter",
    "join_semi_active_customers", "mm_resize_pixels", "q01_pricing_summary",
    "q03_shipping_priority", "q05_local_supplier_volume",
    "q06_forecast_revenue", "q10_returned_items", "q18_large_orders",
    "sample_reservoir_det", "sample_stratified_det", "sim_knn_graph",
    "store_delta_checkpoint", "stream_delta_ingest",
    "stream_late_drop_audit", "stream_queue_ingest", "ts_changepoint_cusum",
    "ts_mad_outliers", "unpivot_lineitem_metrics", "win_rolling_median",
})

# Round-7 window (CORRECTNESS_r07.json): all 50 green — including the one
# query added in round 7 (store_delta_partitioned, first row of the file).
# With this batch rotated to the back, all 182 registered queries have
# driver-green rows, so queries added in round 8 sort alone at the front.
_DRIVER_CHECKED_R07 = frozenset({
    "agg_approx_distinct", "agg_approx_quantiles", "agg_bitmap_distinct",
    "agg_collect_ordered", "agg_countmin_freq", "agg_cube_flags",
    "agg_distinct_counts", "agg_funnel_conversion", "agg_grouping_sets",
    "agg_heavy_hitters", "agg_minmax_by", "agg_mode_deterministic",
    "agg_quantiles", "agg_rollup_priority", "agg_salted_two_phase",
    "agg_sketch_merge", "join_anti_inactive_customers",
    "join_correlated_avg", "join_dim_enrich",
    "join_full_outer_nation_profile", "join_interval_overlap",
    "join_nonequi_balance_pairs", "join_outer_nation_customers",
    "join_point_in_interval", "join_range_cells", "join_range_price_band",
    "join_runtime_filter", "join_salted_hotkey",
    "join_semi_active_customers", "q01_pricing_summary",
    "q02_best_supplier", "q03_shipping_priority",
    "q05_local_supplier_volume", "q06_forecast_revenue",
    "q07_volume_shipping", "q08_market_share", "q09_product_profit",
    "q10_returned_items", "q11_important_stock", "q12_priority_lines",
    "q13_customer_distribution", "q14_promo_revenue", "q15_top_supplier",
    "q16_supplier_count", "q17_small_quantity_revenue", "q18_large_orders",
    "sample_reservoir_det", "sample_stratified_det",
    "store_delta_partitioned", "unpivot_lineitem_metrics",
})

# Round-8 window (CORRECTNESS_r08.json): all 50 green — including all five
# queries added in round 8 (stream_queue_capped, stream_delta_source,
# text_pmi_collocations, store_delta_optimize, store_delta_vacuum).
_DRIVER_CHECKED_R08 = frozenset({
    "agg_approx_distinct", "agg_approx_quantiles", "agg_bitmap_distinct",
    "agg_collect_ordered", "agg_countmin_freq", "agg_cube_flags",
    "agg_distinct_counts", "agg_funnel_conversion", "agg_grouping_sets",
    "agg_heavy_hitters", "agg_minmax_by", "agg_mode_deterministic",
    "agg_quantiles", "agg_rollup_priority", "agg_salted_two_phase",
    "agg_sketch_merge", "join_anti_inactive_customers",
    "join_correlated_avg", "join_dim_enrich",
    "join_full_outer_nation_profile", "join_interval_overlap",
    "join_nonequi_balance_pairs", "join_outer_nation_customers",
    "join_point_in_interval", "join_range_cells", "join_range_price_band",
    "join_runtime_filter", "join_salted_hotkey",
    "join_semi_active_customers", "q01_pricing_summary",
    "q02_best_supplier", "q03_shipping_priority",
    "q05_local_supplier_volume", "q06_forecast_revenue",
    "q07_volume_shipping", "q08_market_share", "q09_product_profit",
    "q10_returned_items", "q11_important_stock", "q12_priority_lines",
    "q13_customer_distribution", "q18_large_orders",
    "sample_reservoir_det", "sample_stratified_det", "store_delta_optimize",
    "store_delta_vacuum", "stream_delta_source", "stream_queue_capped",
    "text_pmi_collocations", "unpivot_lineitem_metrics",
})

# Round-9 window (CORRECTNESS_r09.json): all 50 green — including all five
# queries added in round 9 (stream_delta_capped, stream_delta_changes,
# stream_delta_starting, store_delta_replacewhere, store_delta_convert).
# With this batch rotated to the back, queries added in round 10 sort alone
# at the front of the driver's check window, followed by the oldest
# never-rechecked names.
_DRIVER_CHECKED_R09 = frozenset({
    "agg_approx_distinct", "agg_approx_quantiles", "agg_bitmap_distinct",
    "agg_collect_ordered", "agg_countmin_freq", "agg_cube_flags",
    "agg_distinct_counts", "agg_funnel_conversion", "agg_grouping_sets",
    "agg_heavy_hitters", "agg_minmax_by", "agg_mode_deterministic",
    "agg_quantiles", "agg_rollup_priority", "agg_salted_two_phase",
    "agg_sketch_merge", "join_anti_inactive_customers", "join_correlated_avg",
    "join_dim_enrich", "join_full_outer_nation_profile",
    "join_interval_overlap", "join_nonequi_balance_pairs",
    "join_outer_nation_customers", "join_point_in_interval", "join_range_cells",
    "join_range_price_band", "join_runtime_filter", "join_salted_hotkey",
    "join_semi_active_customers", "q01_pricing_summary", "q02_best_supplier",
    "q03_shipping_priority", "q05_local_supplier_volume",
    "q06_forecast_revenue", "q07_volume_shipping", "q08_market_share",
    "q09_product_profit", "q10_returned_items", "q11_important_stock",
    "q12_priority_lines", "q13_customer_distribution", "q18_large_orders",
    "sample_reservoir_det", "sample_stratified_det", "store_delta_convert",
    "store_delta_replacewhere", "stream_delta_capped", "stream_delta_changes",
    "stream_delta_starting", "unpivot_lineitem_metrics",
})

# Round-10 window (CORRECTNESS_r10.json): all 50 green — including all 11
# queries added in round 10 (store_delta_colmap_scan, store_delta_cdf,
# store_delta_delete/update/merge/restore/evolve, stream_delta_cdf) plus
# re-attestations of the stalest r1-r3 rows (ts_*, win_*, doc_* families).
_DRIVER_CHECKED_R10 = frozenset({
    "dedup_exact_docs", "dedup_minhash_pairs", "dedup_ngram_jaccard",
    "doc_chunk_overlap", "doc_fingerprint", "doc_language_id",
    "doc_length_histogram", "doc_pack_sequences", "doc_pii_redact",
    "doc_quality_score", "doc_repetition_ratio", "doc_text_stats",
    "doc_tfidf_topterms", "doc_token_bpe_est", "doc_token_totals",
    "doc_vocab_topwords", "doc_winnow_fingerprints", "q19_discounted_revenue",
    "q20_promo_suppliers", "q21_sole_supplier_waits",
    "q22_global_sales_opportunity", "set_intersect_keys",
    "set_union_all_parties", "store_delta_cdf", "store_delta_colmap_scan",
    "store_delta_delete", "store_delta_evolve", "store_delta_merge",
    "store_delta_restore", "store_delta_update", "stream_delta_cdf",
    "ts_asof_forward", "ts_asof_join", "ts_asof_tolerance",
    "ts_interval_days", "ts_merge_series", "ts_ohlc_daily_rollup",
    "ts_ohlc_hourly", "ts_scan_series", "ts_session_gaps",
    "ts_similarity_paa", "ts_tumbling_window", "udf_pandas_lcg_buckets",
    "win_cume_percent", "win_first_last_range", "win_lag_lead_price",
    "win_moving_avg", "win_rank_dense_ntile", "win_running_total",
    "win_topk_orders_per_customer",
})

# Round-11 window (CORRECTNESS_r11.json): all 50 green — including all five
# queries added in round 11 (store_delta_colmap_id, store_delta_zorder,
# store_delta_ntz, store_delta_dv_scan, store_delta_v2ckpt) plus
# re-attestations of the stalest r3-r4 rows (sim_*, mm_*, scalar_*, set_*
# families).
_DRIVER_CHECKED_R11 = frozenset({
    "dedup_canonical_docs", "dedup_cluster_docs", "dedup_contamination",
    "dedup_embedding_pairs", "dedup_simhash", "dedup_verified_pairs",
    "embed_random_projection", "json_props_extract", "mm_audio_meta",
    "mm_decode_features", "mm_meta_stats", "pipeline_clean_corpus",
    "pivot_status_by_flag", "q04_order_priority", "scalar_array_map_funcs",
    "scalar_bitwise_funcs", "scalar_datetime_funcs", "scalar_hash_funcs",
    "scalar_math_conditional", "scalar_string_funcs", "set_dropdup_events",
    "set_except_all_keys", "set_except_keys", "set_intersect_all_keys",
    "sim_bucket_topk", "sim_cosine_topk", "sim_ivf_topk", "sim_lsh_buckets",
    "sim_norm_stats", "sort_global_topk", "stats_moments",
    "store_delta_colmap_id", "store_delta_dv_scan", "store_delta_ntz",
    "store_delta_v2ckpt", "store_delta_zorder", "stream_asof_enrich",
    "stream_dedup_union", "stream_interval_join", "stream_ohlc_bars",
    "stream_session_windows", "stream_tumbling_hourly",
    "text_bigram_counts", "ts_autocorr_lag1", "ts_ewma",
    "ts_resample_ffill", "ts_zscore_outliers", "udaf_weighted_avg_price",
    "udtf_text_parts", "win_range_frame",
})

# Round-12 window (CORRECTNESS_r12.json): all 50 green — including both
# queries added in round 12 (store_delta_dv_file, store_delta_evolve_mapped)
# plus re-attestations of the stalest r5/r6 rows (corpus_*, dedup_*,
# stream_*, ts_* families).
_DRIVER_CHECKED_R12 = frozenset({
    "corpus_mixture_weights", "corpus_shard_assign",
    "corpus_token_budget", "dedup_cluster_chain", "dedup_containment",
    "dedup_edit_distance", "dedup_incremental_exact",
    "dedup_semantic_pairs", "dedup_simhash_pairs", "dedup_source_matrix",
    "doc_domain_caps", "embed_kmeans_clusters", "embed_quantize_int8",
    "graph_pagerank_dedup", "mm_arrow_features", "mm_frame_sample",
    "mm_resize_pixels", "q14_promo_revenue", "q15_top_supplier",
    "q16_supplier_count", "sim_knn_graph", "store_bucketed_join",
    "store_compact_retention", "store_delta_checkpoint",
    "store_delta_dv_file", "store_delta_evolve_mapped",
    "store_deltalog_scan", "store_merge_upsert", "store_rtszip_scan",
    "store_snapshot_scan", "store_zorder_scan", "stream_delta_ingest",
    "stream_late_drop_audit", "stream_queue_ingest",
    "stream_restart_recovery", "stream_sliding_windows",
    "stream_snapshot_ingest", "stream_stateful_fold",
    "stream_static_enrich", "ts_asof_nearest", "ts_changepoint_cusum",
    "ts_corr_series", "ts_linreg_trend", "ts_mad_outliers",
    "ts_resample_interp", "ts_vwap_hourly", "udf_cogrouped_funnel",
    "udf_grouped_minmax_scale", "win_gaps_islands", "win_rolling_median",
})

# Round-13 window (CORRECTNESS_r13.json): all 50 green — including the five
# queries added in round 13 (store_delta_cdf_dv, store_delta_dv_delete,
# store_delta_dv_merge, store_delta_rowid_dml, store_delta_variant) plus
# re-attestations of the stalest agg_*/join_*/q*/sample_* rows.
_DRIVER_CHECKED_R13 = frozenset({
    "agg_approx_distinct", "agg_approx_quantiles", "agg_bitmap_distinct",
    "agg_collect_ordered", "agg_countmin_freq", "agg_cube_flags",
    "agg_distinct_counts", "agg_funnel_conversion", "agg_grouping_sets",
    "agg_heavy_hitters", "agg_minmax_by", "agg_mode_deterministic",
    "agg_quantiles", "agg_rollup_priority", "agg_salted_two_phase",
    "agg_sketch_merge", "join_anti_inactive_customers",
    "join_correlated_avg", "join_dim_enrich",
    "join_full_outer_nation_profile", "join_interval_overlap",
    "join_nonequi_balance_pairs", "join_outer_nation_customers",
    "join_point_in_interval", "join_range_cells", "join_range_price_band",
    "join_runtime_filter", "join_salted_hotkey",
    "join_semi_active_customers", "q01_pricing_summary",
    "q03_shipping_priority", "q05_local_supplier_volume",
    "q06_forecast_revenue", "q10_returned_items",
    "q17_small_quantity_revenue", "q18_large_orders",
    "sample_reservoir_det", "sample_stratified_det", "store_delta_cdf_dv",
    "store_delta_dv_delete", "store_delta_dv_merge", "store_delta_optimize",
    "store_delta_partitioned", "store_delta_rowid_dml",
    "store_delta_vacuum", "store_delta_variant", "stream_delta_source",
    "stream_queue_capped", "text_pmi_collocations",
    "unpivot_lineitem_metrics",
})

# Round-14 window (CORRECTNESS_r14.json): all 50 green — including the two
# queries added by the inherited r14 build (store_delta_dv_mapped,
# store_delta_variant_shredded) plus re-attestations of the stalest
# doc_*/ts_*/win_*/TPC-H rows.
_DRIVER_CHECKED_R14 = frozenset({
    "doc_fingerprint", "doc_language_id", "doc_length_histogram",
    "doc_pack_sequences", "doc_pii_redact", "doc_quality_score",
    "doc_repetition_ratio", "doc_text_stats", "doc_token_bpe_est",
    "doc_token_totals", "doc_vocab_topwords", "q02_best_supplier",
    "q07_volume_shipping", "q08_market_share", "q09_product_profit",
    "q11_important_stock", "q12_priority_lines", "q13_customer_distribution",
    "q19_discounted_revenue", "q20_promo_suppliers", "q21_sole_supplier_waits",
    "q22_global_sales_opportunity", "set_intersect_keys",
    "set_union_all_parties", "store_delta_convert", "store_delta_dv_mapped",
    "store_delta_replacewhere", "store_delta_variant_shredded",
    "stream_delta_capped", "stream_delta_changes", "stream_delta_starting",
    "ts_asof_forward", "ts_asof_join", "ts_asof_tolerance",
    "ts_interval_days", "ts_merge_series", "ts_ohlc_daily_rollup",
    "ts_ohlc_hourly", "ts_scan_series", "ts_session_gaps",
    "ts_similarity_paa", "ts_tumbling_window", "udf_pandas_lcg_buckets",
    "win_cume_percent", "win_first_last_range", "win_lag_lead_price",
    "win_moving_avg", "win_rank_dense_ntile", "win_running_total",
    "win_topk_orders_per_customer",
})

# Queries REWRITTEN by the round-14/15 optimization work whose driver rows
# predate the rewrite (the r14 verdict's item 1): their equivalence so far
# rests on the builder's full-registry DuckDB emulation + pytest gates, so
# they jump the queue — ahead of never-checked and stalest — until the
# driver's own oracle re-attests the current form. r14 rewrites:
# ts_resample_interp (single-pass lead() algorithm), ts_asof_nearest
# (reversed incremental frame), store_compact_retention/store_merge_upsert
# (write_partitioned one-exchange dedup), store_bucketed_join (parallel
# one-file-per-bucket writes), store_delta_merge/store_delta_dv_merge
# (one-pass merge discovery), dedup/sim expression builders
# (dedup_semantic_pairs, dedup_simhash_pairs, dedup_minhash_pairs,
# sim_cosine_topk, pipeline_clean_corpus). r15 rewrites are appended as
# they land (join_nonequi_balance_pairs band-bucketing, dedup_cluster_chain
# round construction, stream schema/start hygiene).
_RECHECK_R15_TOUCHED = (
    "ts_resample_interp", "ts_asof_nearest", "store_compact_retention",
    "store_merge_upsert", "store_bucketed_join", "store_delta_merge",
    "store_delta_dv_merge", "dedup_semantic_pairs", "dedup_simhash_pairs",
    "dedup_minhash_pairs", "sim_cosine_topk", "pipeline_clean_corpus",
    "join_nonequi_balance_pairs", "dedup_cluster_chain",
    "dedup_cluster_docs", "dedup_canonical_docs",
)

_DRIVER_CHECKED = (
    _DRIVER_CHECKED_R01_R02 | _DRIVER_CHECKED_R03 | _DRIVER_CHECKED_R04
    | _DRIVER_CHECKED_R05 | _DRIVER_CHECKED_R06 | _DRIVER_CHECKED_R07
    | _DRIVER_CHECKED_R08 | _DRIVER_CHECKED_R09 | _DRIVER_CHECKED_R10
    | _DRIVER_CHECKED_R11 | _DRIVER_CHECKED_R12 | _DRIVER_CHECKED_R13
    | _DRIVER_CHECKED_R14
) - (_RECHECK_R05 - _DRIVER_CHECKED_R05)


# Within the never-checked block, the judge-graded first-class families
# (similarity search, multimodal, streaming, end-to-end pipeline,
# decontamination) must land inside the driver's 50-entry check window —
# there are 60 never-checked queries, so whatever sorts last waits another
# round. Prefix-priority: earlier prefix → earlier slot; ties keep registry
# (insertion) order.
_PRIORITY_PREFIXES = (
    "sim_", "mm_", "stream_", "pipeline_", "dedup_", "doc_", "ts_", "udf_",
    "udtf_", "udaf_",
)


def _rank(name: str) -> int:
    for i, p in enumerate(_PRIORITY_PREFIXES):
        if name.startswith(p):
            return i
    return len(_PRIORITY_PREFIXES)


# Per-round windows in check order, oldest first: a proven query's freshness
# is the LAST round that re-checked it. Ordering proven names by that round
# (ascending) makes the driver's 50-entry window re-attest the stalest rows
# each round instead of re-checking the registry prefix forever.
_ROUND_WINDOWS = (
    _DRIVER_CHECKED_R01_R02, _DRIVER_CHECKED_R03, _DRIVER_CHECKED_R04,
    _DRIVER_CHECKED_R05, _DRIVER_CHECKED_R06, _DRIVER_CHECKED_R07,
    _DRIVER_CHECKED_R08, _DRIVER_CHECKED_R09, _DRIVER_CHECKED_R10,
    _DRIVER_CHECKED_R11, _DRIVER_CHECKED_R12, _DRIVER_CHECKED_R13,
    _DRIVER_CHECKED_R14,
)


def _last_checked(name: str) -> int:
    for i in range(len(_ROUND_WINDOWS) - 1, -1, -1):
        if name in _ROUND_WINDOWS[i]:
            return i
    return -1


def _ordered_names() -> list[str]:
    """Optimization-rewritten queries first (their driver rows predate the
    rewrite — re-attest NOW), then never-driver-checked queries (priority
    prefixes, then registry order), then proven ones stalest-first (oldest
    last-checked round)."""
    names = list(REGISTRY)
    touched = [n for n in _RECHECK_R15_TOUCHED if n in REGISTRY]
    rest = [n for n in names if n not in touched]
    unchecked = [n for n in rest if n not in _DRIVER_CHECKED]
    unchecked.sort(key=lambda n: (_rank(n), names.index(n)))
    checked = [n for n in rest if n in _DRIVER_CHECKED]
    checked.sort(key=lambda n: (_last_checked(n), names.index(n)))
    return touched + unchecked + checked


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: REGISTRY[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }
