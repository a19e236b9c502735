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


def test_priority_prefix_rotates_to_unchecked_tail():
    """The driver's correctness gate truncates at ~50 entries; r1-r3
    all verified the same prefix, so round 4 rotates the gate: a small
    engine+flagship head, then ONLY queries that have never had a
    driver CORRECTNESS row.  Pin that contract."""
    import glob
    import json
    import os

    from core2_spark.queries.registry import _PRIORITY, all_queries

    names = list(all_queries())
    # every priority name actually exists (catches typos/renames)
    missing = [n for n in _PRIORITY if n not in names]
    assert not missing, missing
    # and the priority list is exactly the head of the ordering
    assert names[: len(_PRIORITY)] == _PRIORITY
    first50 = names[:50]
    # engine rows re-verify every round (the r2 regression class)
    for n in [
        "engine_sql_time_travel",
        "engine_dml_roundtrip",
        "engine_changes_feed",
        "temporal_asof_bitemporal",
        "dedup_minhash_lsh",
        "knn_brute_force_cosine",
    ]:
        assert n in first50, n
    # the bulk of the gate goes to never-driver-checked names
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    checked: set[str] = set()
    for f in glob.glob(os.path.join(repo, "CORRECTNESS_r0[123].json")):
        checked |= set(json.load(open(f)))
    if checked:  # driver artifacts present
        fresh = [n for n in first50 if n not in checked]
        assert len(fresh) >= 35, f"only {len(fresh)} never-checked names in gate"


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
