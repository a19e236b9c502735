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
    """The driver's correctness gate truncates at ~50 entries; round 7
    rotates for FRESHNESS: the window is headed by the new r7 queries
    (never driver-checked), then every name whose latest driver
    CORRECTNESS row predates round 3 — evidence that predates the
    _row_seq fix, day-partitioning, and the staging/manifest write
    path.  Pin that contract."""
    import glob
    import json
    import os
    import re

    from core2_spark.queries.registry import _PRIORITY, all_queries

    names = list(all_queries())
    # every priority name actually exists (catches typos/renames)
    missing = [n for n in _PRIORITY if n not in names]
    assert not missing, missing
    # and the priority list is exactly the head of the ordering
    assert names[: len(_PRIORITY)] == _PRIORITY
    first50 = names[:50]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, int] = {}
    for f in glob.glob(os.path.join(repo, "CORRECTNESS_r0*.json")):
        rnd = int(re.search(r"_r(\d+)", f).group(1))
        for k, v in json.load(open(f)).items():
            if not v.get("err") or v.get("err") == "no_oracle":
                latest[k] = max(latest.get(k, 0), rnd)
    if latest:  # driver artifacts present
        # never-checked names (new this round) head the gate window
        unchecked = [n for n in names if n not in latest]
        outside = [n for n in unchecked if n not in first50]
        assert not outside, f"never-checked names outside the gate: {outside}"
        # the window's remaining slots hold the OLDEST evidence first:
        # nothing inside the window may be fresher than anything the
        # window displaced (staleness is monotone across the boundary).
        # r7's 8 new + 42 r1-stale names fill the 50 slots exactly, so
        # the r2/r3 backlog queues immediately after for the r8 window.
        window_rounds = [latest[n] for n in first50 if n in latest]
        displaced = [
            latest[n] for n in names[50 : len(_PRIORITY)] if n in latest
        ]
        if window_rounds and displaced:
            assert max(window_rounds) <= min(displaced), (
                "gate window holds fresher evidence than the names it "
                f"displaced: max(in)={max(window_rounds)} > "
                f"min(out)={min(displaced)}"
            )


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
