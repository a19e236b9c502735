"""Blocked fuzzy record linkage as a reusable operator.

Classic entity resolution: blocking turns the O(N²) all-pairs
edit-distance into an equi-join whose quadratic lives only inside each
block; the blocking key (extra equality columns + a name prefix) is
part of the operator contract, so oracles mirror it exactly.  Catalyst
extracts the equality conjuncts into join keys and leaves the `<`
ordering plus the edit-distance threshold as post-join filters — a
plain shuffled hash join, no nested loop (plan-pinned in
tests/test_plans.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blocked_fuzzy_pairs(
    df: DataFrame,
    *,
    key_col: str,
    name_col: str,
    block_cols: Sequence[str] = (),
    prefix_len: int = 14,
    max_dist: int = 2,
) -> DataFrame:
    """Candidate pairs within (block_cols × name prefix) blocks at
    Levenshtein ≤ ``max_dist``; each unordered pair appears once
    (left_key < right_key).  Output: (left_key, right_key, left_name,
    right_name, edit_dist) ordered by the key pair."""
    # Repartition the probe side by the blocking key: the edit-distance
    # work is proportional to Σ block², and a compact table often scans
    # as a handful of parquet partitions (at bench scale: ONE), which
    # would serialize every comparison behind the broadcast join onto
    # one core (measured 16 s → 2 s at sf0.1).  Hashing on the block
    # key spreads blocks across spark.sql.shuffle.partitions cores and
    # is exactly the co-partitioning a non-broadcast plan would need
    # at cluster scale, so the same plan survives 100×.
    # The partition count is EXPLICIT: AQE coalesces by shuffle bytes,
    # and a 15k-row table is "one partition" of bytes even when its
    # blocked self-join is minutes of CPU — an explicit count opts out
    # of coalescing (REPARTITION_BY_NUM) and keeps every core busy.
    from core2_spark.plans import spread_partitions

    prefix = F.substring(F.col(name_col), 1, prefix_len)
    a = spread_partitions(
        df, *[F.col(c) for c in block_cols], prefix
    ).alias("a")
    b = df.alias("b")
    dist = F.levenshtein(F.col(f"a.{name_col}"), F.col(f"b.{name_col}"))
    conds = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in block_cols]
    conds.append(
        F.substring(F.col(f"a.{name_col}"), 1, prefix_len)
        == F.substring(F.col(f"b.{name_col}"), 1, prefix_len)
    )
    conds.append(F.col(f"a.{key_col}") < F.col(f"b.{key_col}"))
    return (
        a.join(b, on=conds)
        .filter(dist <= max_dist)
        .select(
            F.col(f"a.{key_col}").alias("left_key"),
            F.col(f"b.{key_col}").alias("right_key"),
            F.col(f"a.{name_col}").alias("left_name"),
            F.col(f"b.{name_col}").alias("right_name"),
            dist.cast("int").alias("edit_dist"),
        )
        .orderBy("left_key", "right_key")
    )


def blocked_fuzzy_oracle_sql(
    *,
    table: str,
    key_col: str,
    name_col: str,
    block_cols: Sequence[str] = (),
    prefix_len: int = 14,
    max_dist: int = 2,
) -> str:
    """DuckDB mirror of :func:`blocked_fuzzy_pairs`."""
    block_conds = "".join(
        f" AND a.{c} = b.{c}" for c in block_cols
    )
    return f"""
    SELECT a.{key_col} AS left_key,
           b.{key_col} AS right_key,
           a.{name_col} AS left_name,
           b.{name_col} AS right_name,
           CAST(levenshtein(a.{name_col}, b.{name_col}) AS INTEGER) AS edit_dist
    FROM {table} a
    JOIN {table} b
      ON substr(a.{name_col}, 1, {prefix_len}) = substr(b.{name_col}, 1, {prefix_len})
     AND a.{key_col} < b.{key_col}{block_conds}
    WHERE levenshtein(a.{name_col}, b.{name_col}) <= {max_dist}
    ORDER BY left_key, right_key
    """
