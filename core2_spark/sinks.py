"""Write-path / object-store sinks (SURVEY.md §2.1 sinks).

core2 seals chunks into an object store [upstream: core2
`object_store.clj`]; Spark's write path is the analogue, with two
scale-critical disciplines this module packages:

- **partitioned layout**: partition columns become directories →
  partition pruning at read (the reference's metadata block pruning,
  by layout instead of footers);
- **bucketing**: pre-hash-partitioned + sorted-by-key table files, so
  later joins/aggregations on the bucket key need NO shuffle at all —
  the strongest co-location tool Spark has for repeated 100 TB joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Directory-partitioned parquet (partition-pruning layout)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_with_bloom_filters(
    df: DataFrame,
    path: str,
    key_cols: list[str] | None = None,
    expected_ndv: int = 100_000,
    mode: str = "overwrite",
) -> None:
    """Parquet with bloom filters — the engine's analogue of core2's
    per-block bloom metadata [upstream: core2 `bloom.clj`,
    `metadata.clj`]: point-lookup predicates skip row groups whose
    filter rejects the value (reader-automatic, config not code).

    This Spark build ignores the per-column
    ``parquet.bloom.filter.enabled#col`` form (verified empirically:
    file sizes unchanged), so the filter is enabled globally; when
    ``key_cols`` is given, the frame is projected so only lookup-worthy
    columns pay the filter bytes — project-then-join layouts anyway at
    scale.  ``expected_ndv`` sizes the filters."""
    out = df.select(*key_cols) if key_cols else df
    (
        out.write.mode(mode)
        .option("parquet.bloom.filter.enabled", "true")
        .option("parquet.bloom.filter.expected.ndv", str(expected_ndv))
        .parquet(path)
    )


def write_sorted_layout(
    df: DataFrame,
    path: str,
    range_col: str,
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Range-partitioned + sorted-within-file layout: each file covers
    a narrow ``range_col`` interval, so Parquet min/max footer stats
    prune whole files for range predicates — the poor-man's Z-order
    (one dimension), standing in for core2's temporal-index pruning
    when ``range_col`` is a time column."""
    (
        df.repartitionByRange(n_files, range_col)
        .sortWithinPartitions(range_col)
        .write.mode(mode)
        .parquet(path)
    )


def zorder_key(df: DataFrame, cols: list[str], bits: int = 10):
    """Z-order (Morton) key over ``cols``: each column is rank-mapped
    to a ``bits``-bit integer (rank, not raw value, so skewed
    distributions still spread evenly), then the bit planes are
    interleaved.  Rows close in Z-key are close in EVERY dimension, so
    a range-partitioned-by-Z layout gives multi-column file pruning
    from plain parquet min/max footer stats — the multi-dimensional
    upgrade of ``write_sorted_layout`` and the distributed stand-in
    for core2's kd-tree block pruning
    [upstream: core2 `temporal/kd_tree.clj`].

    The rank map is ``repartitionByRange(2^bits, col)`` +
    ``spark_partition_id()``: Spark computes the range boundaries from
    a distributed reservoir sample, so the bucket id IS the rank
    bucket — one ordinary shuffle per column and no driver collect.
    (The original shape, ``percent_rank`` OVER an un-partitioned
    window, funnels every row through ONE WindowExec task — a
    write-path scale-killer the round-7 global-window audit caught;
    exact rank needs a total order, rank BUCKETS only need sampled
    boundaries.)  The explicit partition count is deliberate: a
    user-specified count is not AQE-coalescible, so the id range
    stays 0..2^bits-1 regardless of data size.  2^bits buckets per
    dimension bounds rows-per-bucket at ~N/2^bits — size ``bits`` so
    that stays well under the target file size at your N (the default
    1024 buckets/dim resolves ~1000 files; raise it past that).

    The seeded random TIE-BREAKER in the range key matters: without
    it a low-cardinality column's ties collapse to one partition per
    distinct value (measured: 150 distinct keys → ids 0..149 while a
    continuous column spans 0..1023), leaving the column's high bits
    dead so the interleave degenerates to a single-column sort.  With
    it every column's ids cover the full 0..2^bits-1 range and the
    bit planes stay balanced; the id remains monotone in the column
    (the tie-break only orders WITHIN equal values, where order is
    free)."""
    from pyspark.sql import functions as F

    out = df
    nb = 1 << bits
    for i, c in enumerate(cols):
        out = out.repartitionByRange(nb, F.col(c), F.rand(17)).withColumn(
            f"_r{i}", F.spark_partition_id().cast("long")
        )
    z = F.lit(0)
    for bit in range(bits):
        for i in range(len(cols)):
            plane = (F.col(f"_r{i}").bitwiseAND(F.lit(1 << bit))) != 0
            z = z + F.when(plane, F.lit(1 << (bit * len(cols) + i))).otherwise(0)
    return out.withColumn("_z", z).drop(*[f"_r{i}" for i in range(len(cols))])


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = 10,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered parquet layout: range-partition + sort by the
    Morton key so each file covers a small hyper-rectangle of ``cols``
    — predicates on ANY of the clustered columns prune files via
    footer stats, not just the first sort column."""
    keyed = zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 16,
    mode: str = "overwrite",
) -> None:
    """Bucketed + sorted managed table: joins on ``bucket_col`` between
    two tables bucketed the same way plan with zero Exchange."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table_name)
    )
