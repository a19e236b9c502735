"""Differential tests: every registered oracle query must match DuckDB
at sf0.001 — the local twin of the driver's CORRECTNESS gate (the
driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from core2_spark.queries.registry import all_oracles, all_queries
from tests.conftest import SF_DIR
from tests.parity import assert_frames_match, rows_only_canonical

ORACLES = all_oracles()
QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, duck):
    spark_pdf = QUERIES[name](spark, SF_DIR).toPandas()
    duck_pdf = duck.execute(ORACLES[name]).df()
    assert_frames_match(spark_pdf, duck_pdf, name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_canonicalize(name, spark):
    """Rows-only queries must survive the driver's canonicalization,
    not just count() — the r5 `multimodal_feature_extract` red row was
    an unhashable array<double> cell the old count()-only twin missed.

    Two layers: a static schema gate (no top-level array/map/struct —
    the driver sorts cell values in a pandas hashtable) and the
    driver-identical value sort over the materialized result."""
    from pyspark.sql import types as T

    df = QUERIES[name](spark, SF_DIR)
    complex_cols = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not complex_cols, (
        f"{name}: rows-only output has driver-uncanonicalizable "
        f"complex columns {complex_cols}; emit scalar digests instead"
    )
    pdf = df.toPandas()
    rows = rows_only_canonical(pdf)
    assert len(rows) == len(pdf)
    assert len(df.schema.fields) > 0
