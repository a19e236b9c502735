"""Differential tests: every registered oracle query must match DuckDB
at sf0.001 — the local twin of the driver's CORRECTNESS gate (the
driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from core2_spark.queries.registry import all_oracles, all_queries
from tests.conftest import SF_DIR
from tests.parity import assert_frames_match

ORACLES = all_oracles()
QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, duck):
    spark_pdf = QUERIES[name](spark, SF_DIR).toPandas()
    duck_pdf = duck.execute(ORACLES[name]).df()
    assert_frames_match(spark_pdf, duck_pdf, name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name, spark):
    df = QUERIES[name](spark, SF_DIR)
    n = df.count()
    assert n >= 0
    assert len(df.schema.fields) > 0
