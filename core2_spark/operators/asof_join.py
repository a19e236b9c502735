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
    direction: str = "backward",
    tolerance=None,
) -> DataFrame:
    """For each left row, attach the ``value_cols`` of the nearest
    right row in ``direction`` with equal ``by_cols``:

    - ``backward`` (default): most recent right.ts <= left.ts;
    - ``forward``: earliest right.ts >= left.ts.

    ``tolerance`` (optional, a Column/literal in the ts column's
    difference algebra, e.g. ``F.expr("INTERVAL 5 MINUTES")`` or an
    integer for numeric ts) additionally requires
    ``|left.ts - right.ts| <= tolerance`` — out-of-range matches
    become NULL, as in pandas merge_asof.

    Right must be unique per (by_cols, ts_col) for a deterministic
    result — pre-aggregate if it isn't.  One shuffle on by_cols, no
    range join.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    l_tagged = left.withColumn("_side", F.lit(1))
    for v in value_cols:
        l_tagged = l_tagged.withColumn(v, F.lit(None))
    r_tagged = right.select(
        *by_cols, ts_col, *value_cols
    ).withColumn("_side", F.lit(0))
    if tolerance is not None:
        # carry the matched right timestamp so the distance check can
        # null out matches beyond the tolerance
        r_tagged = r_tagged.withColumn("_r_ts", F.col(ts_col))
    u = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    # Window direction: backward looks at preceding rows (right rows
    # at the same instant sort first → inclusive <=); forward mirrors
    # it with a following frame and right rows sorting last.
    if direction == "backward":
        w = (
            Window.partitionBy(*by_cols)
            .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        pick = lambda v: F.last(v, ignorenulls=True).over(w)  # noqa: E731
    else:
        w = (
            Window.partitionBy(*by_cols)
            .orderBy(F.col(ts_col).asc(), F.col("_side").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        pick = lambda v: F.first(v, ignorenulls=True).over(w)  # noqa: E731

    for v in value_cols:
        u = u.withColumn(v, pick(v))
    if tolerance is not None:
        u = u.withColumn("_r_ts", pick("_r_ts"))
        in_range = F.abs(F.col(ts_col) - F.col("_r_ts")) <= tolerance
        for v in value_cols:
            u = u.withColumn(v, F.when(in_range, F.col(v)))
        u = u.drop("_r_ts")
    return u.filter(F.col("_side") == 1).drop("_side")
