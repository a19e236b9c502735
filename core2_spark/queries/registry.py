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


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return dict(_ORACLES)


_LOADED = False


def _ensure_loaded() -> None:
    """Import every query module exactly once to populate the registry."""
    global _LOADED
    if _LOADED:
        return
    # Imports are side-effecting: each module's @query decorators register.
    from core2_spark.queries import (  # noqa: F401
        aggregates,
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
