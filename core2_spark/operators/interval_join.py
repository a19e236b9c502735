"""Binned interval-overlap join (SURVEY.md §2.3 range-join family).

A naive interval overlap join (`l.start < r.end AND r.start < l.end`)
has no equi-key, so Spark plans it as a broadcast-nested-loop or a
cartesian — O(N·M) at any scale.  The scale-correct shape is BINNING:
slice time into fixed-width bins, explode each interval onto the bins
it covers, equi-join on (bin, *keys), then verify the exact overlap
predicate.  Each true overlapping pair shares at least the bin
containing max(l.start, r.start), and emitting the pair ONLY from that
canonical bin deduplicates without a `distinct` (no extra shuffle).

Cost model: shuffle volume is rows × bins-per-interval, so pick
``bin_seconds`` near the typical interval length (1–2 bins per
interval).  The ``max_bins_per_interval`` guard refuses intervals that
would explode (a year-long interval at 1-minute bins is 525k rows) —
the same discipline as the other scale guards.

Reference: core2 evaluates theta/range joins directly
[upstream: core2 `operator/join.clj`]; the binned form is how the same
semantics stay shuffle-based on Spark at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bin_of(ts_col: F.Column, bin_seconds: int) -> F.Column:
    return F.floor(ts_col.cast("double") / bin_seconds).cast("long")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    keys: tuple[str, ...] = (),
    bin_seconds: int = 600,
    max_bins_per_interval: int = 1024,
) -> DataFrame:
    """Pairs whose half-open intervals [l_start, l_end) × [r_start,
    r_end) overlap, with equal ``keys`` on both sides.  Column names
    must be disjoint between the two inputs (apart from ``keys``)."""

    def binned(df: DataFrame, start: str, end: str) -> DataFrame:
        b0 = _bin_of(F.col(start), bin_seconds)
        b1 = _bin_of(F.col(end), bin_seconds)
        guard = F.when(
            b1 - b0 > max_bins_per_interval,
            F.raise_error(
                F.concat(
                    F.lit(
                        f"interval spans more than {max_bins_per_interval} "
                        f"bins of {bin_seconds}s — widen bin_seconds or "
                        "split the interval: "
                    ),
                    F.col(start).cast("string"),
                )
            ),
        ).otherwise(b1)
        return df.withColumn("_bin", F.explode(F.sequence(b0, guard)))

    lb = binned(left, l_start, l_end)
    rb = binned(right, r_start, r_end)
    joined = lb.join(rb, ["_bin", *keys])
    overlap = (F.col(l_start) < F.col(r_end)) & (F.col(r_start) < F.col(l_end))
    # canonical-bin dedup: emit only from the bin holding the later start
    canonical = F.col("_bin") == _bin_of(
        F.greatest(F.col(l_start), F.col(r_start)), bin_seconds
    )
    return joined.filter(overlap & canonical).drop("_bin")
