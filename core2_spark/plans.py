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
