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
