"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 (plus the
LLM-pipeline extensions), one (spark, sf_dir) -> DataFrame callable each.
``oracle_sql()`` — the DuckDB-equivalent ANSI SQL per query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q5-shaped multiway join) on /root/testdata/sf0.001."""
    from trough_spark.queries import QUERIES, load_all

    load_all()
    return QUERIES["b5_join_multiway"](spark, "/root/testdata/sf0.001")


# The driver samples a prefix of the registry when it can't run everything,
# so order queries by how much a fresh correctness row is worth: first the
# round-10 additions (no evidence yet), then the 10 queries whose latest
# driver evidence is round 6 (the oldest anywhere in the registry — after
# this round's run nothing should be older than r7), then the queries whose
# SEMANTICS round-10 dialect work touched (printf %q/%Q/%w now implemented,
# json_each key-corner guards, non-literal GLOB fallback), then the round-7
# block, then round-8, then the round-9-green prefix (freshest, lowest
# priority).
_SAMPLE_PRIORITY = [
    # --- new in round 10: no driver evidence yet ---
    "b12_shim_json_tree",
    "text_bpe_encode",
    "pipeline_bpe_pack_ids",
    # --- latest evidence: round 6 (oldest -> highest priority) ---
    "events_attribution_touch",
    "sim_kmeans_train",
    "sim_kmeans_update",
    "sim_matryoshka_topk",
    "sim_semantic_dedup",
    "sim_srp_multiprobe_pairs",
    "stream_dedup_ids",
    "vec_pq_encode",
    "vec_pq_recall",
    "vec_quantization_error",
    # --- round-10 dialect changes touch these code paths: re-evidence ---
    "b12_scalar_functions",
    "b12_shim_json_each",
    "b12_dialect_shim_roundtrip2",
    "b12_dialect_shim_roundtrip",
    "b4_filter_predicates",
    # --- latest evidence: round 7 ---
    "sample_temperature_lang",
    "sample_dsir_weights",
    "sample_weighted_es",
    "sample_weighted_per_lang",
    "sample_budget_select",
    "sample_budget_per_lang",
    "pipeline_dsir_budget",
    "a2_row_to_json",
    "a3_segment_routing",
    "a7_regexp_function",
    "a8_seed_crawled_status",
    "a9_build_redirect_array",
    "a12_fanout_regex",
    "a12_cross_segment_global",
    "asof_join_last_signup",
    "events_multigrain_rollup",
    "interval_join_sessions",
    "sim_incremental_ann",
    "sketch_hll_distinct",
    "sketch_countmin_heavy_hitters",
    "sketch_hll_hourly_users",
    "sketch_equidepth_histogram",
    "sketch_kmv_quantiles",
    "stream_tumbling_hourly",
    "stream_sliding_2h_1h",
    "stream_sessionization",
    "stream_funnel_conversion",
    "stream_stream_join",
    "stream_cohort_retention",
    "bloom_semijoin_prune",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_minhash_signatures",
    "dedup_simhash",
    "dedup_keep_first",
    "dedup_connected_components",
    "dedup_simhash_pairs",
    "dedup_incremental",
    "dedup_cc_star",
    "dedup_span_coverage",
    "dedup_fuzzy_levenshtein",
    "multimodal_image_features",
    "multimodal_audio_features",
    "skew_salted_aggregation",
    "skew_salted_join",
    "multimodal_resize",
    "sample_hash_split",
    "sample_stratified",
    # --- latest evidence: round 8 (freshest, lowest priority) ---
    "events_rate_anomaly",
    "text_ccnet_bucket",
    "sample_cluster_split",
    "vec_bq_rescore_topk",
    "vec_bq_hamming_topk",
    "pipeline_near_dedup",
    "dedup_source_matrix",
    "text_pmi_cooccurrence",
    "text_c4_filters",
    "text_hybrid_rrf",
    "dedup_containment",
    "pipeline_url_dedup",
    "text_gopher_rules",
    "text_ngram_novelty",
    "sample_interleave_lang",
    "text_token_entropy",
    "text_bigram_logprob",
    "pack_sequences",
    "sample_mix_rebalance",
    "text_token_count",
    "text_quality_features",
    "text_lang_id",
    "text_fingerprint",
    "text_tfidf_top_terms",
    "text_top_terms",
    "text_bpe_token_count",
    "text_boilerplate_ratio",
    "text_contamination",
    "text_unigram_logprob",
    "text_repetition_ratio",
    "text_source_rollup",
    "text_pii_scrub",
    "text_chunk_windows",
    "text_bm25_search",
    "text_surt_canonicalize",
    "text_outlier_mad",
    "text_quality_ntile",
    "text_hashed_ann_topk",
    "pipeline_curation",
    "b3_projection_expressions",
    "b5_join_outer_semi_anti",
    "b6_agg_pricing_summary",
    "vec_pq_adc_topk",
    "vec_ivfpq_search",
    "sketch_source_overlap",
    "dedup_minhash_verify",
    # --- latest evidence: round 9 (freshest, lowest priority) ---
    "sample_repeat_upsample",
    "dedup_cross_decontaminate",
    "b12_shim_literal_escape",
    "text_bpe_train",
    "text_bpe_segment",
    "sample_length_batches",
    "pipeline_bpe_pack",
    "b12_shim_window_filter",
    "b6_group_concat_distinct",
    "dedup_chunk_rewrite",
    "multimodal_frame_sample",
    "stream_session_window_native",
    "multimodal_phash",
    "pack_sequences_sharded",
    "sample_train_order",
    "sample_bottom_k_per_group",
    "sample_group_cap",
    "text_html_strip",
    "text_classifier_score",
    "text_hashed_embedding",
    "b5_join_multiway",
    "b7_rollup",
    "b8_window_functions",
    "b9_topk_per_group",
    "b9_order_limit_offset",
    "b10_set_ops",
    "b11_subqueries_cte",
    "b12_datetime_functions",
    "b12_json_functions",
    "b5_theta_cross_join",
    "b6_having",
    "b8_range_frames",
    "b8_groups_frames",
    "b9_nulls_ordering",
    "b11_exists_anti",
    "b6_percentiles",
    "b7_cube_grouping_sets",
    "b6_pivot_priority",
    "layout_zorder_key",
    "sim_cosine_pairs",
    "sim_ann_topk",
    "sim_srp_buckets",
    "sim_srp_bucketed_pairs",
    "sim_ivf_topk",
    "sim_ivf_recall",
    "vec_quantize_int8",
]


def _ordered(mapping: dict) -> dict:
    head = {k: mapping[k] for k in _SAMPLE_PRIORITY if k in mapping}
    tail = {k: v for k, v in mapping.items() if k not in head}
    return {**head, **tail}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from trough_spark.queries import QUERIES, load_all

    load_all()
    return _ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    from trough_spark.queries import ORACLE, load_all

    load_all()
    return _ordered(ORACLE)
