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
    # TPC-H 22-query suite (SURVEY §5.4) — the headline relational surface.
    "tpch_q1_pricing_summary",
    "tpch_q2_min_cost_supplier",
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "tpch_q5_region_revenue",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q10_returned_items",
    "tpch_q11_important_stock",
    "tpch_q12_shipmode_priority",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_share",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_counts",
    "tpch_q17_small_quantity_revenue",
    "tpch_q18_large_volume",
    "tpch_q19_disjunctive_predicate",
    "tpch_q20_potential_promotion",
    "tpch_q21_waiting_suppliers",
    "tpch_q22_global_sales_opportunity",
    # Join family (SURVEY §2.3) — all eight physical/logical shapes.
    "join_inner_equi",
    "join_left_outer",
    "join_full_outer",
    "join_semi",
    "join_anti",
    "join_cross",
    "join_theta_nonequi",
    "join_nullsafe_equal",
    "join_interval_overlap_binned",
    # Bitemporal visibility (SURVEY §2.2/§2.8) — the reference's core.
    "temporal_asof_system",
    "temporal_asof_bitemporal",
    "temporal_system_from_to",
    "temporal_app_from_to",
    "temporal_latest_versions",
    "temporal_rectangle_resolution",
    "period_predicates",
    # Engine path: ingest → bitemporal storage → Snapshot.sql (§3.1/§3.3).
    "engine_sql_time_travel",
    "engine_dml_roundtrip",
    "engine_sql_period_overlaps",
    "engine_dml_portion_of_app_time",
    "engine_changes_feed",
    # LLM-pipeline flagships.
    "dedup_exact_survivors",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard_lsh",
    "dedup_cluster_canonical",
    "knn_brute_force_cosine",
    "corpus_curation_pipeline",
    "embedding_quantize_int8",
    "split_train_val_test",
    "corpus_weighted_mixture",
    "pack_sequences_boundaries",
    # One representative per remaining family.
    "window_topk_per_group",
    "window_distribution",
    "stream_tumbling_window",
    "stream_session_window",
    "agg_basic",
    "agg_rollup",
    "set_union_all",
    "set_except_all",
    "orderby_multi_key_limit",
    "unwind_explode",
    "array_higher_order",
    "json_dynamic_access",
    "subquery_not_in_3vl",
    "apply_correlated_scalar",
    "recursion_fixpoint_ancestors",
    "datalog_rules_recursive",
    "asof_join_enrichment",
    "skew_salted_hot_key_agg",
    "grouped_map_pandas",
    "dynamic_variant_union_legs",
    "null_three_valued_logic",
    "cast_functions",
    "string_regex_functions",
    "datetime_construction",
    "interval_arithmetic",
    "pivot_sum_values",
    "external_csv_source",
    "table_literal_values",
    "graph_linear_path_4hop",
    "ts_last_point_per_device",
    "text_quality_stats",
    "ts_hourly_rollup_daily_peak",
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
