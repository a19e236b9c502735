"""Window functions (SURVEY.md §2.9 — Spark-native extension).

core2's research SQL had no OVER clause; these are engine capabilities
beyond the reference (upstream XTDB 2.x later grew a subset).  The
engine also *needs* row_number internally: bitemporal latest-version
dedup (temporal.py) and OFFSET both ride on it.

Scale note: every window here partitions by a key (customer, label) —
no global single-partition windows, which would serialize at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from core2_spark.catalog import load_tables
from core2_spark.queries.registry import query
from core2_spark.queries.util import fround


@query(
    "window_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 4) AS o_totalprice
    FROM orders
    QUALIFY ROW_NUMBER() OVER
      (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) <= 3
    """,
)
def window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — row_number + filter."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 3)
        .select("o_custkey", "o_orderkey", fround("o_totalprice").alias("o_totalprice"))
    )


@query(
    "window_rank_dense",
    oracle="""
    SELECT n_nationkey,
           CAST(RANK() OVER (ORDER BY n_regionkey, n_nationkey) AS BIGINT) AS rk,
           CAST(DENSE_RANK() OVER (ORDER BY n_regionkey) AS BIGINT)        AS drk,
           CAST(NTILE(4) OVER (ORDER BY n_nationkey) AS BIGINT)            AS quartile
    FROM nation
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile (global window on a tiny dim only)."""
    n = load_tables(spark, sf_dir, ("nation",))["nation"]
    return n.select(
        "n_nationkey",
        F.rank()
        .over(Window.orderBy("n_regionkey", "n_nationkey"))
        .cast("bigint")
        .alias("rk"),
        F.dense_rank().over(Window.orderBy("n_regionkey")).cast("bigint").alias("drk"),
        F.ntile(4).over(Window.orderBy("n_nationkey")).cast("bigint").alias("quartile"),
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(o_orderdate AS DATE) AS order_date,
           CAST(LAG(o_orderdate) OVER w AS DATE)  AS prev_date,
           CAST(LEAD(o_orderdate) OVER w AS DATE) AS next_date,
           DATEDIFF('day',
                    CAST(LAG(o_orderdate) OVER w AS DATE),
                    CAST(o_orderdate AS DATE))    AS days_since_prev
    FROM orders
    WHERE o_custkey <= 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead navigation within customer order history."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return (
        o.filter(F.col("o_custkey") <= 100)
        .select(
            "o_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            prev.cast("date").alias("prev_date"),
            F.lead("o_orderdate").over(w).cast("date").alias("next_date"),
            F.datediff(F.col("o_orderdate").cast("date"), prev.cast("date"))
            .cast("bigint")
            .alias("days_since_prev"),
        )
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2)
             AS running_total,
           CAST(COUNT(*) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS nth_order
    FROM orders
    WHERE o_custkey <= 100
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative frame: running total + ordinal per customer."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.filter(F.col("o_custkey") <= 100).select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(38,6)")).over(w).cast("double"), 2
        ).alias("running_total"),
        F.count("*").over(w).cast("bigint").alias("nth_order"),
    )


@query(
    "window_statistics",
    oracle="""
    SELECT c_custkey,
           ROUND(STDDEV_SAMP(c_acctbal) OVER
             (PARTITION BY c_mktsegment), 4) AS seg_stddev,
           ROUND(c_acctbal
                 - CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) OVER
                     (PARTITION BY c_mktsegment) AS DOUBLE)
                   / COUNT(*) OVER (PARTITION BY c_mktsegment)
                 + 0.000000001, 4) AS bal_vs_seg_avg
    FROM customer
    WHERE c_custkey <= 200
    """,
)
def window_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic aggregates over unordered partitions: per-segment
    stddev and deviation from the exact-decimal segment mean (double
    AVG differs by summation order between engines and the deviations
    land on rounding ties — the usual dsum discipline, window form)."""
    c = load_tables(spark, sf_dir, ("customer",))["customer"]
    w = Window.partitionBy("c_mktsegment")
    seg_avg = (
        F.sum(F.col("c_acctbal").cast("decimal(38,6)")).over(w).cast("double")
        / F.count("*").over(w)
    )
    return c.filter(F.col("c_custkey") <= 200).select(
        "c_custkey",
        fround(F.stddev_samp("c_acctbal").over(w)).alias("seg_stddev"),
        F.round(F.col("c_acctbal") - seg_avg + 1e-9, 4).alias("bal_vs_seg_avg"),
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT c_custkey,
           CAST(COUNT(*) OVER
             (PARTITION BY c_mktsegment ORDER BY c_acctbal
              RANGE BETWEEN 500 PRECEDING AND 500 FOLLOWING) AS BIGINT)
             AS n_within_500
    FROM customer
    WHERE c_custkey <= 300
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a numeric ordering — peers counted by value
    distance (±500 balance), not row position."""
    o = load_tables(spark, sf_dir, ("customer",))["customer"]
    w = (
        Window.partitionBy("c_mktsegment")
        .orderBy(F.col("c_acctbal"))
        .rangeBetween(-500, 500)
    )
    return o.filter(F.col("c_custkey") <= 300).select(
        "c_custkey",
        F.count("*").over(w).cast("bigint").alias("n_within_500"),
    )


@query(
    "window_moving_avg",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS DOUBLE)
             / COUNT(*) OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
             + 0.000000001, 6) AS moving_avg,
           ROUND(FIRST_VALUE(o_totalprice) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS first_price
    FROM orders
    WHERE o_custkey <= 100
    """,
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded sliding frame (±2 rows) + first_value."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    wb = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    frame = wb.rowsBetween(-2, 2)
    moving_sum = F.sum(F.col("o_totalprice").cast("decimal(38,6)")).over(frame).cast("double")
    return o.filter(F.col("o_custkey") <= 100).select(
        "o_custkey",
        "o_orderkey",
        F.round(moving_sum / F.count("*").over(frame) + 1e-9, 6).alias("moving_avg"),
        fround(F.first("o_totalprice").over(wb), 2).alias("first_price"),
    )
