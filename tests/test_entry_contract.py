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
    """The driver's correctness gate truncates at ~50 entries; round 6
    closes the ledger: the 8-name engine+flagship head, then the 8
    round-5 names that never had a driver CORRECTNESS row plus the
    re-fixed multimodal_feature_extract, then the new round-6 queries
    — all inside the gate.  Remaining slots re-verify flagships.
    Pin that contract."""
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
    # every name with NO driver CORRECTNESS row through r5 (incl. the
    # r5 error row being re-verified, and the new r6 queries) must sit
    # inside the gate window
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    checked: set[str] = set()
    for f in glob.glob(os.path.join(repo, "CORRECTNESS_r0[12345].json")):
        data = json.load(open(f))
        checked |= {k for k, v in data.items() if not v.get("err") or v.get("err") == "no_oracle"}
    if checked:  # driver artifacts present
        unchecked = [n for n in names if n not in checked]
        outside = [n for n in unchecked if n not in first50]
        assert not outside, f"never-checked names outside the gate: {outside}"


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
