"""Triple agreement: for ANSI-portable oracle strings, Spark SQL
executing the ORACLE TEXT must match the DataFrame implementation
(which the DuckDB harness already matches) — three independent
evaluations of one query, closing the loop on dialect drift: if an
oracle quietly relied on a DuckDB-ism, or a DataFrame plan diverged
from its SQL statement, this catches it."""

from __future__ import annotations

import pytest

from core2_spark.catalog import TABLES, load_table
from core2_spark.queries.registry import all_oracles, all_queries
from tests.conftest import SF_DIR
from tests.parity import assert_frames_match

# Randomized/fuzz/soak tier (VERDICT r11 task 2): excluded from the
# default run so the driver's verify finishes; run with -m slow /
# --runslow / SPARK_GRAFT_RUN_SLOW=1.  Deterministic gate coverage of
# the same machinery stays in the default tier (oracle parity, unit
# and plan-shape tests).
pytestmark = pytest.mark.slow


# Oracles written in the ANSI subset both engines parse — 113 of the
# 170 oracle pairs; the remainder use DuckDB list/recursive-CTE
# features Spark lacks (list_transform, WITH RECURSIVE, ASOF JOIN).
PORTABLE = [
    # TPC-H — all 22
    *[f"tpch_q{i}_" for i in ()],  # (names are explicit below)
    "tpch_q1_pricing_summary", "tpch_q2_min_cost_supplier",
    "tpch_q3_shipping_priority", "tpch_q4_order_priority",
    "tpch_q5_region_revenue", "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping", "tpch_q8_market_share",
    "tpch_q9_product_profit", "tpch_q10_returned_items",
    "tpch_q11_important_stock", "tpch_q12_shipmode_priority",
    "tpch_q13_customer_distribution", "tpch_q14_promo_share",
    "tpch_q15_top_supplier", "tpch_q16_supplier_counts",
    "tpch_q17_small_quantity_revenue", "tpch_q18_large_volume",
    "tpch_q19_disjunctive_predicate", "tpch_q20_potential_promotion",
    "tpch_q21_waiting_suppliers", "tpch_q22_global_sales_opportunity",
    # joins
    "join_inner_equi", "join_left_outer", "join_full_outer", "join_cross",
    "join_semi", "join_anti", "join_theta_nonequi", "join_nullsafe_equal",
    "join_interval_overlap_binned",
    # temporal
    "temporal_asof_system", "temporal_asof_bitemporal",
    "temporal_system_from_to", "temporal_app_from_to", "period_predicates",
    # engine path
    "engine_sql_time_travel", "engine_dml_roundtrip",
    "engine_sql_period_overlaps", "engine_dml_portion_of_app_time",
    "engine_dml_delete_portion", "engine_changes_feed",
    # aggregates / sets / sort
    "agg_basic", "agg_distinct", "agg_stats", "agg_bool",
    "agg_count_if_filtered", "agg_having", "agg_rollup", "agg_cube",
    "agg_grouping_sets", "grouping_sets_sql",
    "set_union_all", "set_union_distinct", "set_intersect_all",
    "set_intersect_distinct", "set_except_all", "set_except_distinct",
    "orderby_multi_key_limit", "orderby_nulls_first", "limit_offset",
    # subqueries / apply
    "subquery_scalar", "subquery_in", "subquery_not_in_3vl",
    "apply_correlated_scalar", "apply_correlated_exists",
    "multi_column_in_subquery", "exists_flag_projection", "with_cte_reuse",
    # relational / functions
    "project_compute", "select_compound_predicate", "rename_columns",
    "distinct_rows", "case_when", "conditional_functions", "math_functions",
    "string_functions_extended", "arithmetic_safe", "null_three_valued_logic",
    "datetime_extract", "date_trunc_monthly_revenue", "unpivot_stack",
    "tagged_identifier_types", "dynamic_variant_union_legs",
    # windows / streaming twins / ts / graph
    "window_rank_dense", "window_running_sum", "window_statistics",
    "window_range_frame", "window_moving_avg", "window_distribution",
    "stream_tumbling_window", "stream_sliding_window", "stream_session_window",
    "stream_interval_join_batch_twin",
    "ts_last_point_per_device", "ts_hourly_rollup_daily_peak",
    "graph_linear_path_4hop", "graph_star_supplier_profile",
    "graph_copurchase_pairs",
    # datalog twins / external sources / scale ops
    "datalog_join_filter", "datalog_aggregate", "datalog_not_exists",
    "datalog_two_hop_graph", "datalog_in_bindings", "datalog_rules_union",
    "external_csv_source", "external_json_source", "external_arrow_source",
    "table_literal_values", "skew_salted_hot_key_agg", "grouped_map_pandas",
    # training-data recipes
    "split_train_val_test", "corpus_weighted_mixture",
    "pack_sequences_boundaries",
]


@pytest.fixture(scope="module", autouse=True)
def _views(spark):
    for t in TABLES:
        load_table(spark, SF_DIR, t).createOrReplaceTempView(t)


@pytest.mark.parametrize("name", PORTABLE)
def test_spark_sql_matches_dataframe(spark, name):
    oracle = all_oracles()[name]
    via_sql = spark.sql(oracle).toPandas()
    via_df = all_queries()[name](spark, SF_DIR).toPandas()
    assert_frames_match(via_df, via_sql, f"{name} (spark-sql twin)")
