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
# eight vector/similarity queries that have NEVER been driver-sampled in
# rounds 1-3 (the scale flagships — IVF, SemDeDup, k-means, quantization),
# then this round's fixes (PQ ADC integer-grid rework, session-window
# oracle, frame-sample oracle), then one representative per §2 row, then
# the already-multi-green remainder.
_SAMPLE_PRIORITY = [
    # never driver-sampled in rounds 1-3 (VERDICT r3 item 3)
    "sim_ivf_topk",
    "sim_ivf_recall",
    "sim_kmeans_update",
    "sim_kmeans_train",
    "sim_semantic_dedup",
    "sim_srp_multiprobe_pairs",
    "vec_quantize_int8",
    "vec_quantization_error",
    # round-4 reworks + new operators — fresh green rows needed
    "vec_pq_adc_topk",
    "vec_pq_encode",
    "vec_pq_recall",
    "stream_session_window_native",
    "multimodal_frame_sample",
    "vec_ivfpq_search",
    "sim_incremental_ann",
    "text_html_strip",
    "sample_group_cap",
    "events_multigrain_rollup",
    "text_classifier_score",
    "dedup_chunk_rewrite",
    "multimodal_phash",
    "sketch_kmv_quantiles",
    "sketch_source_overlap",
    "text_hashed_embedding",
    "text_hashed_ann_topk",
    # §2.A (driver-green r3; keep one early row each)
    "a2_row_to_json",
    "a7_regexp_function",
    "a8_seed_crawled_status",
    "a9_build_redirect_array",
    "a12_cross_segment_global",
    "b12_dialect_shim_roundtrip",
    "a3_segment_routing",
    "a12_fanout_regex",
    # events-reading queries
    "stream_tumbling_hourly",
    "stream_sliding_2h_1h",
    "stream_sessionization",
    "stream_funnel_conversion",
    "stream_stream_join",
    "stream_cohort_retention",
    "sketch_hll_distinct",
    "sketch_hll_hourly_users",
    "sketch_countmin_heavy_hitters",
    "sketch_equidepth_histogram",
    "asof_join_last_signup",
    "interval_join_sessions",
    "b12_json_functions",
    # §2.B representatives
    "b5_join_multiway",
    "sample_bottom_k_per_group",
    "b5_theta_cross_join",
    "dedup_minhash_verify",
    "b6_having",
    "b6_percentiles",
    "sim_matryoshka_topk",
    "multimodal_resize",
    "text_quality_ntile",
    "b8_range_frames",
    "b8_groups_frames",
    "b9_topk_per_group",
    "b9_nulls_ordering",
    "stream_dedup_ids",
    "b11_subqueries_cte",
    "b11_exists_anti",
    "b12_scalar_functions",
    "b12_datetime_functions",
    "b7_cube_grouping_sets",
    "b6_pivot_priority",
    "dedup_fuzzy_levenshtein",
    "text_surt_canonicalize",
    "text_outlier_mad",
    "events_attribution_touch",
    "layout_zorder_key",
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
