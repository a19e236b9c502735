"""SparkSession factory tuned for this engine.

core2 executes queries single-node over Arrow batches (reference
README.adoc:12 — Arrow-native columnar).  Spark's analogue of that
vectorized execution is whole-stage codegen over columnar Parquet
batches; the knobs below make the distributed plan behave well both on
local[N] test runs and (by design) on a large cluster:

- AQE on: runtime coalescing of shuffle partitions, skew-join splitting
  and dynamic broadcast conversion replace any hand-tuned plan.
- shuffle.partitions sized to cores locally; on a real cluster this is
  overridden by AQE's coalescing from an initial high value.
- UTC session timezone: core2 queries are repeatable at a basis with an
  explicit default-tz; we pin UTC so results are deterministic and
  comparable against the DuckDB oracle.
- Arrow transfer on: every Pandas-UDF boundary is Arrow-batched.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = "/root/testdata/sf0.1"


def get_spark(
    app_name: str = "core2-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS (driver contract) or '*'.
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    n_shuffle = shuffle_partitions or (
        int(cpus) if str(cpus).isdigit() else (os.cpu_count() or 8)
    )
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.mergeSchema", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.spill.compress", "true")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
