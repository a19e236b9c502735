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

# Oracles written in the ANSI subset both engines parse.
PORTABLE = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "tpch_q5_region_revenue",
    "tpch_q6_forecast_revenue",
    "tpch_q10_returned_items",
    "tpch_q12_shipmode_priority",
    "tpch_q14_promo_share",
    "join_inner_equi",
    "join_semi",
    "join_anti",
    "join_interval_overlap_binned",
    "agg_basic",
    "agg_rollup",
    "set_union_all",
    "split_train_val_test",
    "corpus_weighted_mixture",
    "pack_sequences_boundaries",
    "engine_sql_time_travel",
    "engine_changes_feed",
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
