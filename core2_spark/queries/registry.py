"""Registry of driver-checkable queries.

Every operator capability claimed in SURVEY.md §2 registers here as a
``(spark, sf_dir) -> DataFrame`` callable, optionally paired with an
ANSI-SQL oracle string DuckDB runs on the same Parquet tables.  The
driver hash-compares the two result sets (row count + schema +
order-insensitive value hash), so:

- every computed column is aliased identically on both sides,
- floating-point aggregates are rounded (see ``fround``) on both sides,
- queries with LIMIT/OFFSET carry a total deterministic ORDER BY.

Queries without an oracle (approx sketches, streaming, LSH internals)
register with ``oracle=None`` → the driver records a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` as a named engine query.

    ``oracle`` is equivalent DuckDB SQL over the pre-registered views
    (region nation customer supplier part orders lineitem events
    documents embeddings), or None for rows-only checks.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


# Driver-gate priority: the round-1 correctness gate truncated at the
# first ~50 registry entries in insertion order, so micro-variant
# aggregates consumed slots while every TPC-H/join/temporal flagship
# went driver-unchecked.  all_queries()/all_oracles() therefore emit
# this explicit priority prefix first (flagship suites, then one
# representative per operator family), falling back to registration
# order for the tail.  Any prefix of the returned dict is then a
# maximally-informative correctness sample.
_PRIORITY: list[str] = [
    # Head: the engine rows re-verified every round (the full DML/
    # time-travel/CDC surface goes through the real write path), plus
    # the bitemporal and TPC-H flagships.  Trimmed from 12 to 8 this
    # round so the whole never-checked tail fits inside the driver's
    # ~50-entry truncation window.
    "engine_sql_time_travel",
    "engine_dml_roundtrip",
    "engine_sql_period_overlaps",
    "engine_dml_portion_of_app_time",
    "engine_dml_delete_portion",
    "engine_changes_feed",
    "temporal_asof_bitemporal",
    "tpch_q1_pricing_summary",
    # Rotation (round 6): close the ledger.  Slots 9-17 are the 8
    # round-5 names that have never had a driver CORRECTNESS row
    # (cross-checked against CORRECTNESS_r01..r05) plus the re-fixed
    # `multimodal_feature_extract` (the r5 red row, now emitting scalar
    # feature columns).  Green on all nine → every registered query has
    # independent driver evidence.  New round-6 queries follow
    # immediately (never checked by definition), then ~30 slots of
    # flagship re-verification fill the driver's ~50-row window.
    "engine_mview_incremental",
    "engine_speculative_with_tx",
    "engine_sql_basis_now",
    "join_lateral_topk",
    "external_orc_source",
    "curation_pii_detect",
    "curation_decontaminate_substring",
    "text_repetition_filter",
    "multimodal_feature_extract",
    # New in round 6 (never driver-checked by definition): the
    # partition-drop vacuum, optimistic concurrent writers, and the
    # JPEG decode leg.
    "engine_vacuum_partition_drop",
    "engine_concurrent_writers",
    "multimodal_jpeg_features",
    "multimodal_video_frames",
    "dedup_exact_substring_spans",
    "graph_pagerank_fixed_iterations",
    "multimodal_audio_features",
    # Flagship re-verification: bench headliners + one representative
    # per operator family, rotated back in after their last check.
    "tpch_q3_shipping_priority",
    "tpch_q5_region_revenue",
    "tpch_q10_returned_items",
    "tpch_q18_large_volume",
    "tpch_q21_waiting_suppliers",
    "agg_distinct",
    "agg_grouping_sets",
    "window_topk_per_group",
    "window_rank_dense",
    "join_full_outer",
    "join_anti",
    "join_interval_overlap_binned",
    "asof_join_enrichment",
    "temporal_latest_versions",
    "temporal_rectangle_resolution",
    "period_predicates",
    "recursion_fixpoint_ancestors",
    "datalog_rules_recursive",
    "unwind_with_ordinality",
    "json_dynamic_access",
    "dynamic_variant_union_legs",
    "subquery_not_in_3vl",
    "set_except_all",
    "stream_tumbling_window",
    "stream_session_window",
    "dedup_exact_survivors",
    "dedup_minhash_lsh",
    "dedup_cluster_canonical",
    "knn_brute_force_cosine",
    "embedding_quantize_int8",
    "corpus_curation_pipeline",
    "curation_decontaminate_ngram",
    "curation_pii_redact",
    "split_train_val_test",
    "pack_sequences_boundaries",
    "text_tfidf_distinctive_term_per_doc",
    "skew_salted_hot_key_agg",
    "grouped_map_pandas",
    "external_csv_source",
    "engine_replica_cdc_roundtrip",
    # Previously driver-verified queries (r1-r5 green) follow.
    "map_construct_access",
    "project_compute",
    "select_compound_predicate",
    "rename_columns",
    "distinct_rows",
    "case_when",
    "conditional_functions",
    "string_functions",
    "math_functions",
    "orderby_nulls_first",
    "limit_offset",
    "set_intersect_all",
    "set_intersect_distinct",
    "set_except_distinct",
    "set_union_by_name_missing",
    "set_union_distinct",
    "stream_sliding_window",
    "stream_interval_join_batch_twin",
    "datetime_extract",
    "date_trunc_monthly_revenue",
    "ts_gap_fill_locf",
    "ts_device_delta_stats",
    "window_lag_lead",
    "window_running_sum",
    "window_statistics",
    "window_range_frame",
    "window_moving_avg",
    "dedup_simhash",
    "knn_lsh_bucketed",
    "knn_ivf_probe",
    "knn_ivf_partitioned_layout",
    "multimodal_image_resize",
    "multimodal_frame_sampling",
    "embedding_cosine_near_dup",
    "knn_quantized_lsh",
    "stream_structured_tumbling",
    "stream_kafka_log_transport",
    "stream_cdc_log_tail",
    "corpus_weighted_mixture",
    "orderby_multi_key_limit",
    "unwind_explode",
    "array_higher_order",
    "null_three_valued_logic",
    "cast_functions",
    "interval_arithmetic",
    "ts_last_point_per_device",
    "text_quality_stats",
    "ts_hourly_rollup_daily_peak",
    "graph_copurchase_pairs",
    "graph_connected_components",
    "subquery_scalar",
    "subquery_in",
    "exists_flag_projection",
    "dedup_exact_groups",
    "dedup_ngram_jaccard",
    "text_language_id",
    "text_fingerprint",
    "knn_top3_per_label",
    "embedding_norm_stats",
    "embedding_label_near_dup",
    "text_doc_frequency_idf",
    "text_unigram_logprob_score",
    "text_chunk_windows_udtf",
    "unwind_outer_empty",
    "array_functions",
    "json_from_json_struct",
    "struct_construct_access",
    "set_semantics_arrays",
    "tagged_identifier_types",
    "tpch_q2_min_cost_supplier",
    "tpch_q4_order_priority",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q11_important_stock",
    "tpch_q12_shipmode_priority",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_share",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_counts",
    "tpch_q17_small_quantity_revenue",
    "tpch_q19_disjunctive_predicate",
    "tpch_q20_potential_promotion",
    "tpch_q22_global_sales_opportunity",
    "join_inner_equi",
    "join_left_outer",
    "join_semi",
    "join_cross",
    "join_theta_nonequi",
    "join_nullsafe_equal",
    "temporal_asof_system",
    "temporal_system_from_to",
    "temporal_app_from_to",
    "dedup_ngram_jaccard_lsh",
    "window_distribution",
    "agg_basic",
    "agg_rollup",
    "set_union_all",
    "apply_correlated_scalar",
    "string_regex_functions",
    "datetime_construction",
    "pivot_sum_values",
    "table_literal_values",
    "graph_linear_path_4hop",
    "agg_stats",
    "agg_bool",
    "agg_array_agg",
    "agg_count_if_filtered",
    "agg_having",
    "agg_cube",
    "agg_percentile_exact",
    "agg_min_by_max_by",
    "agg_approx_sketches",
    "apply_correlated_exists",
    "multi_column_in_subquery",
    "pivot_status_by_priority",
    "unpivot_stack",
    "external_json_source",
    "datalog_join_filter",
    "datalog_aggregate",
    "datalog_not_exists",
    "datalog_two_hop_graph",
    "datalog_in_bindings",
    "datalog_rules_union",
    "external_arrow_source",
    "asof_join_forward_tolerance",
    "string_functions_extended",
    "decimal_exact_arithmetic",
    "bitwise_operations",
    "hash_functions",
    "arithmetic_safe",
    "datetime_extract_extended",
    "like_variants",
    "time_of_day_encoding",
    "with_cte_reuse",
    "grouping_sets_sql",
    "graph_star_supplier_profile",
]


def _priority_ordered(mapping: dict[str, object]) -> dict[str, object]:
    head = {n: mapping[n] for n in _PRIORITY if n in mapping}
    tail = {n: v for n, v in mapping.items() if n not in head}
    return {**head, **tail}


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return _priority_ordered(_QUERIES)  # type: ignore[return-value]


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return _priority_ordered(_ORACLES)  # type: ignore[return-value]


_LOADED = False


def _ensure_loaded() -> None:
    """Import every query module exactly once to populate the registry."""
    global _LOADED
    if _LOADED:
        return
    # Imports are side-effecting: each module's @query decorators register.
    from core2_spark.queries import (  # noqa: F401
        aggregates,
        engine_q,
        extras_q,
        functions_q,
        graph_q,
        joins_q,
        llm_q,
        nested,
        relational,
        sort_set,
        streaming_q,
        temporal_q,
        tpch,
        tpch2,
        tsdevices_q,
        windows_q,
    )

    _LOADED = True
