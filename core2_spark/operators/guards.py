"""Cardinality guards (SURVEY.md §2.3 `:max-1-row`).

core2 wraps scalar subqueries in a max-1-row operator that errors when
the relation has more than one row [upstream: core2
`operator/max_1_row.clj`].  The distributed form counts with a LIMIT 2
short-circuit — never a full count of a huge relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class CardinalityError(ValueError):
    pass


def max_1_row(df: DataFrame) -> DataFrame:
    """Assert the relation has at most one row (scalar-subquery guard).

    Evaluates with ``limit(2)`` so the check reads at most two rows no
    matter the input size, then returns the original (lazy) frame.
    """
    n = df.limit(2).count()
    if n > 1:
        raise CardinalityError("scalar subquery returned more than one row")
    return df
