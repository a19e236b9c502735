"""Bitemporal visibility + temporal expression queries (SURVEY.md §2.2
temporal rows, §2.8 date/time + period families, §3.3 DML model).

The bitemporal fixtures are *derived deterministically inside the
query* from `orders` — version 1 of each order at o_orderdate, version
2 (10% price cut) 5 days later for open orders, app-time validity
[o_orderdate, o_orderdate + 30 days).  Both engines derive the same
relation, so the DuckDB oracle checks the full visibility semantics:
as-of on each axis, FROM..TO ranges, latest-version dedup.

Determinism rule carried from the reference: queries never read the
wall clock — every basis (S, T) is an explicit literal parameter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from core2_spark.catalog import load_tables
from core2_spark.functions import periods
from core2_spark.queries.registry import query
from core2_spark.queries.util import dsum, fround, sql_dsum
from core2_spark import temporal as bt

# Shared derivation of the versioned table, used by several queries.
_VERSIONS_SQL = """
    WITH raw_versions AS (
        SELECT o_orderkey AS id, o_orderstatus,
               o_totalprice                    AS price,
               o_orderdate                     AS system_time_start,
               o_orderdate                     AS app_time_start,
               o_orderdate + INTERVAL 30 DAY  AS app_time_end
        FROM orders
        UNION ALL
        SELECT o_orderkey AS id, o_orderstatus,
               o_totalprice * 0.9             AS price,
               o_orderdate + INTERVAL 5 DAY   AS system_time_start,
               o_orderdate                    AS app_time_start,
               o_orderdate + INTERVAL 30 DAY  AS app_time_end
        FROM orders WHERE o_orderstatus = 'O'
    ),
    versions AS (
        SELECT *,
               COALESCE(LEAD(system_time_start) OVER
                          (PARTITION BY id ORDER BY system_time_start),
                        TIMESTAMP '9999-12-31 00:00:00') AS system_time_end
        FROM raw_versions
    )
"""


def _versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-side derivation: put() two version generations, then
    reconstruct system_time_end with the library's window dedup."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    base = o.select(
        F.col("o_orderkey").alias("id"),
        "o_orderstatus",
        F.col("o_orderdate"),
        F.col("o_totalprice"),
    )
    v1 = bt.put(
        base,
        tx_time=F.col("o_orderdate"),
        app_start=F.col("o_orderdate"),
        app_end=F.col("o_orderdate") + F.expr("INTERVAL 30 DAY"),
    ).withColumn("price", F.col("o_totalprice"))
    v2 = bt.put(
        base.filter(F.col("o_orderstatus") == "O"),
        tx_time=F.col("o_orderdate") + F.expr("INTERVAL 5 DAY"),
        app_start=F.col("o_orderdate"),
        app_end=F.col("o_orderdate") + F.expr("INTERVAL 30 DAY"),
    ).withColumn("price", F.col("o_totalprice") * 0.9)
    raw = v1.unionByName(v2).drop("o_orderdate", "o_totalprice")
    return bt.close_system_versions(raw, "id")


@query(
    "temporal_asof_system",
    oracle=_VERSIONS_SQL
    + """
    SELECT id, o_orderstatus, ROUND(price, 4) AS price
    FROM versions
    WHERE system_time_start <= TIMESTAMP '1999-06-01'
      AND TIMESTAMP '1999-06-01' < system_time_end
    """,
)
def temporal_asof_system(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FOR SYSTEM_TIME AS OF S — what the database knew at S."""
    v = _versions(spark, sf_dir)
    return bt.scan_as_of(v, system_time="1999-06-01").select(
        "id", "o_orderstatus", fround("price").alias("price")
    )


@query(
    "temporal_asof_bitemporal",
    oracle=_VERSIONS_SQL
    + """
    SELECT id, ROUND(price, 4) AS price,
           CAST(app_time_start AS DATE) AS valid_from,
           CAST(app_time_end AS DATE)   AS valid_to
    FROM versions
    WHERE system_time_start <= TIMESTAMP '1999-06-01'
      AND TIMESTAMP '1999-06-01' < system_time_end
      AND app_time_start <= TIMESTAMP '1999-06-15'
      AND TIMESTAMP '1999-06-15' < app_time_end
    """,
)
def temporal_asof_bitemporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both axes at once: facts valid at T as known at S — the
    reference's headline capability (README.adoc:11)."""
    v = _versions(spark, sf_dir)
    return bt.scan_as_of(v, system_time="1999-06-01", app_time="1999-06-15").select(
        "id",
        fround("price").alias("price"),
        F.col(bt.APP_START).cast("date").alias("valid_from"),
        F.col(bt.APP_END).cast("date").alias("valid_to"),
    )


@query(
    "temporal_system_from_to",
    oracle=_VERSIONS_SQL
    + """
    SELECT id, ROUND(price, 4) AS price,
           CAST(system_time_start AS DATE) AS sys_from
    FROM versions
    WHERE system_time_start < TIMESTAMP '1999-02-01'
      AND system_time_end   > TIMESTAMP '1999-01-01'
    """,
)
def temporal_system_from_to(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FOR SYSTEM_TIME FROM lo TO hi — versions overlapping [lo, hi)."""
    v = _versions(spark, sf_dir)
    return bt.scan_between(
        v, bt.SYS_START, bt.SYS_END, "1999-01-01", "1999-02-01"
    ).select(
        "id",
        fround("price").alias("price"),
        F.col(bt.SYS_START).cast("date").alias("sys_from"),
    )


@query(
    "temporal_app_from_to",
    oracle=_VERSIONS_SQL
    + """
    SELECT id, ROUND(price, 4) AS price,
           CAST(app_time_start AS DATE) AS valid_from
    FROM versions
    WHERE app_time_start < TIMESTAMP '1999-08-01'
      AND app_time_end   > TIMESTAMP '1999-07-01'
      AND system_time_start <= TIMESTAMP '2002-01-01'
    """,
)
def temporal_app_from_to(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FOR APPLICATION_TIME FROM lo TO hi — versions whose validity
    overlaps [lo, hi), regardless of when they became known."""
    v = _versions(spark, sf_dir)
    return (
        bt.scan_between(v, bt.APP_START, bt.APP_END, "1999-07-01", "1999-08-01")
        .filter(F.col(bt.SYS_START) <= F.lit("2002-01-01").cast("timestamp"))
        .select(
            "id",
            fround("price").alias("price"),
            F.col(bt.APP_START).cast("date").alias("valid_from"),
        )
    )


@query(
    "temporal_latest_versions",
    oracle=_VERSIONS_SQL
    + """
    SELECT o_orderstatus, COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(price AS DECIMAL(38,6))) AS DOUBLE) + 0.000000001, 2)
             AS total_price
    FROM (SELECT * FROM versions
          QUALIFY ROW_NUMBER() OVER
            (PARTITION BY id ORDER BY system_time_start DESC) = 1)
    GROUP BY o_orderstatus
    """,
)
def temporal_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Current-state view: newest system version per id, aggregated."""
    v = _versions(spark, sf_dir)
    return (
        bt.latest_versions(v, "id")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"), dsum("price", 2).alias("total_price"))
    )


@query(
    "temporal_rectangle_resolution",
    oracle="""
    WITH raw_versions AS (
        SELECT o_orderkey AS id, o_totalprice AS price,
               o_orderdate                    AS system_time_start,
               o_orderdate                    AS app_time_start,
               o_orderdate + INTERVAL 90 DAY  AS app_time_end
        FROM orders
        UNION ALL
        -- partial retroactive correction: only the first 15 days
        SELECT o_orderkey, o_totalprice * 0.8,
               o_orderdate + INTERVAL 5 DAY,
               o_orderdate,
               o_orderdate + INTERVAL 15 DAY
        FROM orders WHERE o_orderstatus = 'O'
    ),
    resolved AS (
        SELECT id, price FROM raw_versions
        WHERE system_time_start <= TIMESTAMP '1999-06-01'
          AND app_time_start <= TIMESTAMP '1999-05-21'
          AND TIMESTAMP '1999-05-21' < app_time_end
        QUALIFY ROW_NUMBER() OVER
          (PARTITION BY id ORDER BY system_time_start DESC) = 1
    )
    SELECT id, ROUND(price, 4) AS price FROM resolved
    """,
)
def temporal_rectangle_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rectangle-correct point resolution (`temporal.resolve_as_of`):
    the latest KNOWN version whose app period COVERS the query instant
    wins — a partial retroactive correction (first 15 days only) never
    shadows later validity, unlike the lead()-closure view."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    base = o.select(
        F.col("o_orderkey").alias("id"), "o_orderstatus", "o_orderdate", "o_totalprice"
    )
    v1 = bt.put(
        base,
        tx_time=F.col("o_orderdate"),
        app_start=F.col("o_orderdate"),
        app_end=F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"),
    ).withColumn("price", F.col("o_totalprice"))
    v2 = bt.put(
        base.filter(F.col("o_orderstatus") == "O"),
        tx_time=F.col("o_orderdate") + F.expr("INTERVAL 5 DAY"),
        app_start=F.col("o_orderdate"),
        app_end=F.col("o_orderdate") + F.expr("INTERVAL 15 DAY"),
    ).withColumn("price", F.col("o_totalprice") * 0.8)
    versions = v1.unionByName(v2).select("id", "price", *bt.TEMPORAL_COLS)
    resolved = bt.resolve_as_of(
        versions, system_time="1999-06-01", app_time="1999-05-21", id_col="id"
    )
    return resolved.select("id", fround("price").alias("price"))


@query(
    "period_predicates",
    oracle="""
    WITH p AS (
        SELECT o_orderkey, o_custkey,
               o_orderdate                   AS p_start,
               o_orderdate + INTERVAL 7 DAY  AS p_end
        FROM orders WHERE o_custkey <= 50
    )
    SELECT a.o_orderkey AS a_key, b.o_orderkey AS b_key,
           (a.p_start < b.p_end AND b.p_start < a.p_end)       AS is_overlaps,
           (a.p_start <= b.p_start AND b.p_end <= a.p_end)     AS is_contains,
           (a.p_end <= b.p_start)                              AS is_precedes,
           (a.p_end = b.p_start)                               AS is_imm_precedes,
           (a.p_start = b.p_start AND a.p_end = b.p_end)       AS is_equals
    FROM p a JOIN p b
      ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
    """,
)
def period_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL:2011 period predicates as column algebra (functions/periods)
    — OVERLAPS / CONTAINS / PRECEDES / IMMEDIATELY PRECEDES / EQUALS
    over per-customer order pairs."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    p = o.filter(F.col("o_custkey") <= 50).select(
        "o_orderkey",
        "o_custkey",
        F.col("o_orderdate").alias("p_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 7 DAY")).alias("p_end"),
    )
    a = p.select(
        F.col("o_orderkey").alias("a_key"),
        F.col("o_custkey").alias("a_cust"),
        F.col("p_start").alias("a_start"),
        F.col("p_end").alias("a_end"),
    )
    b = p.select(
        F.col("o_orderkey").alias("b_key"),
        F.col("o_custkey").alias("b_cust"),
        F.col("p_start").alias("b_start"),
        F.col("p_end").alias("b_end"),
    )
    ast, aen = F.col("a_start"), F.col("a_end")
    bst, ben = F.col("b_start"), F.col("b_end")
    return (
        a.join(b, (F.col("a_cust") == F.col("b_cust")) & (F.col("a_key") < F.col("b_key")))
        .select(
            "a_key",
            "b_key",
            periods.overlaps(ast, aen, bst, ben).alias("is_overlaps"),
            periods.contains_period(ast, aen, bst, ben).alias("is_contains"),
            periods.precedes(ast, aen, bst, ben).alias("is_precedes"),
            periods.immediately_precedes(ast, aen, bst, ben).alias("is_imm_precedes"),
            periods.equals(ast, aen, bst, ben).alias("is_equals"),
        )
    )


@query(
    "datetime_extract",
    oracle="""
    SELECT CAST(EXTRACT(YEAR FROM ts) AS BIGINT)  AS y,
           CAST(EXTRACT(MONTH FROM ts) AS BIGINT) AS m,
           CAST(EXTRACT(DAY FROM ts) AS BIGINT)   AS d,
           CAST(EXTRACT(HOUR FROM ts) AS BIGINT)  AS h,
           COUNT(*) AS n_events,
           {total_value} AS total_value
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY 1, 2, 3, 4
    """.format(total_value=sql_dsum("value")),
)
def datetime_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXTRACT family (year/month/day/hour) over event timestamps."""
    e = load_tables(spark, sf_dir, ("events",))["events"]
    return (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.year("ts").cast("bigint").alias("y"),
            F.month("ts").cast("bigint").alias("m"),
            F.dayofmonth("ts").cast("bigint").alias("d"),
            F.hour("ts").cast("bigint").alias("h"),
        )
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
    )


@query(
    "date_trunc_monthly_revenue",
    oracle="""
    SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS order_month,
           COUNT(*) AS n_orders,
           {revenue} AS revenue
    FROM orders
    GROUP BY 1
    """.format(revenue=sql_dsum("o_totalprice", 2)),
)
def date_trunc_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATE_TRUNC bucketing — the batch form of a monthly rollup."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    return (
        o.groupBy(F.date_trunc("month", "o_orderdate").cast("date").alias("order_month"))
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice", 2).alias("revenue"))
    )


@query(
    "interval_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE)                   AS order_date,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
           CAST(o_orderdate - INTERVAL 1 MONTH AS DATE) AS prior_month,
           CAST(o_orderdate + INTERVAL 14 MONTH AS DATE) AS plus_1y2m,
           DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k
    FROM orders
    WHERE o_orderkey % 13 = 0
    """,
)
def interval_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """+/- INTERVAL arithmetic and date difference."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    return o.filter(F.col("o_orderkey") % 13 == 0).select(
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("order_date"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).cast("date").alias("due_date"),
        (F.col("o_orderdate") - F.expr("INTERVAL 1 MONTH")).cast("date").alias("prior_month"),
        (F.col("o_orderdate") + F.expr("INTERVAL '1-2' YEAR TO MONTH"))
        .cast("date")
        .alias("plus_1y2m"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("bigint")
        .alias("days_to_y2k"),
    )
