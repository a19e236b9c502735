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


def test_priority_prefix_covers_flagships():
    """The driver's correctness gate truncated at ~50 entries in r1;
    the registry now emits a priority prefix so any prefix certifies
    the flagship surface.  Pin that contract."""
    from core2_spark.queries.registry import _PRIORITY, all_queries

    names = list(all_queries())
    # every priority name actually exists (catches typos/renames)
    missing = [n for n in _PRIORITY if n not in names]
    assert not missing, missing
    # and the priority list is exactly the head of the ordering
    assert names[: len(_PRIORITY)] == _PRIORITY
    first50 = set(names[:50])
    for n in [f"tpch_q{i}" for i in range(1, 23)]:
        assert any(q.startswith(n + "_") for q in first50), n
    for n in [
        "join_inner_equi",
        "join_full_outer",
        "join_anti",
        "join_theta_nonequi",
        "temporal_asof_bitemporal",
        "temporal_rectangle_resolution",
        "dedup_exact_survivors",
        "dedup_minhash_lsh",
        "knn_brute_force_cosine",
    ]:
        assert n in first50, n


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
