"""Physical-plan audit helpers (SURVEY.md §4 scale guarantees).

The scale properties this engine promises — pushdown, pruning,
broadcast dims, no cartesian/nested-loop joins — are PLAN shapes, not
results, so they regress silently unless something reads the plan.
These helpers make that a one-liner, both in tests
(`tests/test_plans.py`) and interactively while developing an
operator: build the plan you'd want, then `audit(df)` before shipping.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame

# Operators that should never appear in a scale-path plan: each one
# means a join lost its equi-key (O(N·M) pairwise work).
DEFAULT_FORBIDDEN = ("CartesianProduct", "BroadcastNestedLoopJoin")


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    """`df.explain(mode)` as a string."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def audit(
    df: DataFrame,
    forbid: tuple[str, ...] = DEFAULT_FORBIDDEN,
    require: tuple[str, ...] = (),
) -> str:
    """Assert plan hygiene: none of ``forbid`` appears, all of
    ``require`` do.  Returns the plan text (for further checks);
    raises AssertionError naming the offending fragment otherwise."""
    text = plan_text(df)
    for bad in forbid:
        if bad in text:
            raise AssertionError(
                f"plan contains forbidden operator {bad!r} — the join/agg "
                f"lost its equi-key or broadcast:\n{text}"
            )
    for good in require:
        if good not in text:
            raise AssertionError(f"plan lacks required fragment {good!r}:\n{text}")
    return text


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters fragment of the scan (empty string if none) —
    a filter that doesn't appear here is evaluated AFTER the read, a
    full-scan red flag at 100 TB."""
    text = plan_text(df)
    for line in text.splitlines():
        if "PushedFilters" in line:
            return line.strip()
    return ""


def spread_partitions(df: DataFrame, *key_cols) -> DataFrame:
    """Repartition with an EXPLICIT partition count before CPU-heavy
    per-row work (shingle/signature construction, Python UDF hashing,
    per-pair string/set comparison).

    Why explicit: partition counts follow BYTES — a compact table
    scans as one parquet split, and AQE re-coalesces keyed
    repartitions by advisory size — but these operators are
    minutes-of-CPU per megabyte, so byte-driven layouts serialize
    them onto one core (measured: the blocked fuzzy join at sf0.1 ran
    16 s single-task vs 1.8 s spread; the LSH verify join coalesced
    to 2 tasks).  An explicit count (REPARTITION_BY_NUM) opts out of
    AQE coalescing; max(defaultParallelism, shuffle.partitions)
    matches cores locally and executor slots on a cluster.

    Pass ``key_cols`` when the spread feeds an equi-join on those
    columns: the resulting HashPartitioning then SATISFIES the join's
    distribution requirement, so a non-broadcast plan reuses it
    instead of stacking a fresh (AQE-coalescible) exchange on top —
    a bare round-robin spread would be discarded there.  With no
    keys, rows spread round-robin (right before per-row map work)."""
    sess = df.sparkSession
    n = max(
        sess.sparkContext.defaultParallelism,
        int(sess.conf.get("spark.sql.shuffle.partitions", "8")),
    )
    if key_cols:
        from pyspark.sql import functions as F

        cols = [F.col(c) if isinstance(c, str) else c for c in key_cols]
        return df.repartition(n, *cols)
    return df.repartition(n)
