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
    """The driver's correctness gate truncates at ~50 entries; round 5
    completes the rotation: an 8-name engine+flagship head that
    re-verifies every round, then ALL 40 names that never had a driver
    CORRECTNESS row in r1-r4 — after this gate the independent ledger
    covers the registry 185/185.  Pin that contract."""
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
        "engine_sql_period_overlaps",
        "engine_dml_portion_of_app_time",
        "engine_dml_delete_portion",
        "engine_changes_feed",
        "temporal_asof_bitemporal",
        "tpch_q1_pricing_summary",
    ]:
        assert n in first50, n
    # every name never driver-checked through r4 sits inside the gate
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    checked: set[str] = set()
    for f in glob.glob(os.path.join(repo, "CORRECTNESS_r0[1234].json")):
        checked |= set(json.load(open(f)))
    if checked:  # driver artifacts present
        # the r4-era backlog is the rotation block (slots 9-48); every
        # one of those names must sit inside the gate.  Queries
        # REGISTERED in round 5+ (never in any CORRECTNESS file, not
        # part of that backlog) are exempt — the gate is ~50 slots and
        # the backlog has priority.
        backlog = _PRIORITY[8:48]
        assert not (set(backlog) & checked), "rotation block already checked"
        outside = [n for n in backlog if n not in first50]
        assert not outside, f"backlog names outside the gate: {outside}"


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
