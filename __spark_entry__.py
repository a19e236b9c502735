"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``core2_spark.queries.*`` (one module per
SURVEY.md §2 operator family); this file only adapts the registry to
the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H-Q3-shaped: scan → filter → broadcast+shuffle joins →
    aggregate → top-k over customer ⋈ orders ⋈ lineitem.
    """
    from core2_spark.queries.registry import all_queries

    return all_queries()["tpch_q3_shipping_priority"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from core2_spark.queries.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-checkable query; entries
    absent here (approx sketches, streaming execution, LSH internals)
    get the driver's weaker rows-only check."""
    from core2_spark.queries.registry import all_oracles

    return all_oracles()
