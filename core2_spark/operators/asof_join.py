"""As-of join (SURVEY.md §2.3 range/as-of row).

core2 has no dedicated operator — bitemporal as-of is scan-side and
interval joins are theta joins — but event-stream enrichment ("the
most recent right row at or before each left row") is a core
capability for the time-series workloads the engine targets, and
Spark lacks a built-in.

Implementation is the scale-right union+window trick (SURVEY.md
§2.3): tag both sides, union on (keys, ts), one window pass carries
the latest right values forward onto left rows.  Cost: a single
shuffle on (keys), no range join, no per-group pandas — O(n log n)
within each key partition, robust to arbitrarily large key groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by_cols: list[str],
    value_cols: list[str],
) -> DataFrame:
    """For each left row, attach the ``value_cols`` of the most recent
    right row with right.ts <= left.ts (inclusive) and equal
    ``by_cols``.  Right must be unique per (by_cols, ts_col) for a
    deterministic result — pre-aggregate if it isn't.
    """
    l_tagged = left.withColumn("_side", F.lit(1))
    for v in value_cols:
        l_tagged = l_tagged.withColumn(v, F.lit(None))
    r_tagged = right.select(
        *by_cols, ts_col, *value_cols
    ).withColumn("_side", F.lit(0))
    u = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    # right rows (_side=0) sort before left rows at the same ts →
    # same-instant right values are visible (inclusive <=).
    w = (
        Window.partitionBy(*by_cols)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for v in value_cols:
        u = u.withColumn(v, F.last(v, ignorenulls=True).over(w))
    return u.filter(F.col("_side") == 1).drop("_side")
