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
