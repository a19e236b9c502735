"""Guards on the driver entry contract itself: registry shape,
oracle pairing, and entry() behavior."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_registry_shape():
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    assert len(qs) >= 120
    # every oracle belongs to a registered query
    assert set(os_) <= set(qs)
    # the vast majority is oracle-checked; rows-only is the exception
    assert len(os_) / len(qs) > 0.9
    # callables, not results
    assert all(callable(fn) for fn in qs.values())
    assert all(isinstance(sql, str) and "SELECT" in sql.upper() for sql in os_.values())


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert [f.name for f in df.schema.fields] == ["l_orderkey", "revenue", "o_orderdate"]


def test_oracles_reference_only_registered_views():
    """Oracle SQL must run against the driver's pre-registered views —
    no file paths, no read_parquet escapes."""
    for name, sql in entrymod.oracle_sql().items():
        low = sql.lower()
        assert "read_parquet" not in low, name
        assert "/root/" not in low, name
