"""Version-table layout at scale: partitioning the bitemporal table by
system-time year makes as-of scans prune whole partitions — the
file-layout stand-in for core2's temporal kd-tree (SURVEY.md §4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from core2_spark import temporal as bt
from core2_spark.catalog import load_tables
from core2_spark.sinks import write_partitioned
from tests.conftest import SF_DIR


def test_asof_scan_prunes_time_partitions(spark):
    o = load_tables(spark, SF_DIR, ("orders",))["orders"]
    versions = bt.put(
        o.select(F.col("o_orderkey").alias("id"), "o_totalprice", "o_orderdate"),
        tx_time=F.col("o_orderdate"),
    ).withColumn("sys_year", F.year(bt.SYS_START))

    path = "/root/repo/_data/versions_by_year"
    write_partitioned(versions, path, ["sys_year"])

    vdf = spark.read.parquet(path)
    asof = bt.scan_as_of(vdf, system_time="1996-06-01").filter(
        F.col("sys_year") <= 1996  # year derived from the as-of bound
    )
    plan = asof._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "sys_year" in plan.split("PartitionFilters")[1]
    # correctness: identical rows to the unpartitioned as-of scan
    expected = bt.scan_as_of(versions.drop("sys_year"), system_time="1996-06-01").count()
    assert asof.count() == expected
