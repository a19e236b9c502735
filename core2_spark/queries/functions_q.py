"""Scalar-function parity sweep, part 2 (SURVEY.md §2.8 / M5):
extended strings, date construction/parsing, decimal arithmetic,
bitwise ops, cryptographic hashes, SQL GROUPING SETS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from core2_spark.catalog import load_tables, register_views
from core2_spark.queries.registry import query
from core2_spark.queries.util import sql_dsum


@query(
    "string_functions_extended",
    oracle="""
    SELECT c_custkey,
           left(c_name, 4)                    AS name_left,
           right(c_name, 3)                   AS name_right,
           split_part(c_name, '#', 2)         AS after_hash,
           translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_translated,
           repeat('*', c_nationkey % 4)       AS stars,
           reverse(c_mktsegment)              AS seg_reversed,
           ascii(c_mktsegment)                AS first_code,
           chr(65 + c_nationkey % 26)         AS letter,
           upper(substr(c_mktsegment, 1, 1)) || lower(substr(c_mktsegment, 2))
                                              AS seg_initcap
    FROM customer
    WHERE c_custkey % 9 = 0
    """,
)
def string_functions_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT/RIGHT/SPLIT_PART/TRANSLATE/REPEAT/REVERSE/ASCII/CHR/INITCAP
    (initcap spelled out in the oracle — DuckDB lacks the builtin)."""
    c = load_tables(spark, sf_dir, ("customer",))["customer"]
    return c.filter(F.col("c_custkey") % 9 == 0).select(
        "c_custkey",
        F.expr("left(c_name, 4)").alias("name_left"),
        F.expr("right(c_name, 3)").alias("name_right"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("after_hash"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("seg_translated"),
        F.repeat(F.lit("*"), (F.col("c_nationkey") % 4)).alias("stars"),
        F.reverse("c_mktsegment").alias("seg_reversed"),
        F.ascii("c_mktsegment").cast("bigint").alias("first_code"),
        F.chr(F.lit(65) + F.col("c_nationkey") % 26).alias("letter"),
        F.initcap(F.lower("c_mktsegment")).alias("seg_initcap"),
    )


@query(
    "datetime_construction",
    oracle="""
    SELECT n_nationkey,
           make_date(2020 + n_nationkey % 5, 1 + n_nationkey % 12, 1 + n_nationkey)
             AS built_date,
           CAST(make_timestamp(2024, 1 + n_nationkey % 12, 15, n_nationkey % 24, 30, 0)
                AS TIMESTAMP) AS built_ts,
           last_day(make_date(2024, 1 + n_nationkey % 12, 3)) AS month_end,
           CAST(strptime('2019-07-0' || CAST(1 + n_nationkey % 9 AS VARCHAR),
                         '%Y-%m-%d') AS DATE) AS parsed_date
    FROM nation
    """,
)
def datetime_construction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAKE_DATE / MAKE_TIMESTAMP / LAST_DAY / text→date parsing."""
    n = load_tables(spark, sf_dir, ("nation",))["nation"]
    k = F.col("n_nationkey")
    return n.select(
        "n_nationkey",
        F.make_date(2020 + k % 5, 1 + k % 12, 1 + k).alias("built_date"),
        F.make_timestamp(
            F.lit(2024), 1 + k % 12, F.lit(15), k % 24, F.lit(30), F.lit(0)
        ).alias("built_ts"),
        F.last_day(F.make_date(F.lit(2024), 1 + k % 12, F.lit(3))).alias("month_end"),
        F.to_date(
            F.concat(F.lit("2019-07-0"), (1 + k % 9).cast("string")), "yyyy-MM-dd"
        ).alias("parsed_date"),
    )


@query(
    "decimal_exact_arithmetic",
    oracle="""
    SELECT o_orderstatus,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS exact_total,
           CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2)) * 2) AS VARCHAR) AS exact_double
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def decimal_exact_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DECIMAL exact arithmetic — sums and scaling with no float error,
    emitted as canonical strings so the hash compares digits, not
    engine decimal internals."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    return o.groupBy("o_orderstatus").agg(
        F.sum(dec).cast("decimal(18,2)").cast("string").alias("exact_total"),
        F.max(dec * 2).cast("decimal(18,2)").cast("string").alias("exact_double"),
    )


@query(
    "bitwise_operations",
    oracle="""
    SELECT n_nationkey,
           n_nationkey & 12                    AS b_and,
           n_nationkey | 5                     AS b_or,
           xor(n_nationkey, 9)                 AS b_xor,
           n_nationkey << 2                    AS b_shl,
           n_nationkey >> 1                    AS b_shr,
           CAST(bit_count(n_nationkey) AS BIGINT) AS b_popcount
    FROM nation
    """,
)
def bitwise_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family: AND/OR/XOR/shifts/popcount."""
    n = load_tables(spark, sf_dir, ("nation",))["nation"]
    k = F.col("n_nationkey")
    return n.select(
        "n_nationkey",
        k.bitwiseAND(F.lit(12)).alias("b_and"),
        k.bitwiseOR(F.lit(5)).alias("b_or"),
        k.bitwiseXOR(F.lit(9)).alias("b_xor"),
        F.shiftleft(k, 2).alias("b_shl"),
        F.shiftright(k, 1).alias("b_shr"),
        F.bit_count(k).cast("bigint").alias("b_popcount"),
    )


@query(
    "hash_functions",
    oracle="""
    SELECT r_regionkey,
           md5(r_name)    AS h_md5,
           sha256(r_name) AS h_sha256
    FROM region
    """,
)
def hash_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic digests (md5 / sha-256) — also the substrate of
    the MinHash dedup pipeline."""
    r = load_tables(spark, sf_dir, ("region",))["region"]
    return r.select(
        "r_regionkey",
        F.md5("r_name").alias("h_md5"),
        F.sha2(F.col("r_name"), 256).alias("h_sha256"),
    )


@query(
    "arithmetic_safe",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice / NULLIF(l_discount, 0.0) + 0.000000001, 4)
                                                        AS price_per_disc,
           l_quantity / NULLIF(l_quantity - l_quantity, 0.0) AS div_by_zero,
           ((CAST(l_linenumber AS BIGINT) - 3) % 4 + 4) % 4  AS pmod4
    FROM lineitem
    WHERE l_orderkey % 97 = 0
    """,
)
def arithmetic_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overflow/zero-safe arithmetic: core2's expression engine is
    checked (errors instead of wrapping); Spark's lenient twins are the
    try_* family — division by zero yields NULL, and pmod gives the
    non-negative modulus."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return li.filter(F.col("l_orderkey") % 97 == 0).select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.try_divide(F.col("l_extendedprice"), F.nullif(F.col("l_discount"), F.lit(0.0)))
            + 1e-9,
            4,
        ).alias("price_per_disc"),
        F.try_divide(F.col("l_quantity"), F.col("l_quantity") - F.col("l_quantity")).alias(
            "div_by_zero"
        ),
        F.pmod(F.col("l_linenumber").cast("bigint") - 3, F.lit(4)).alias("pmod4"),
    )


@query(
    "datetime_extract_extended",
    oracle="""
    SELECT CAST(quarter(o_orderdate) AS BIGINT)      AS qtr,
           CAST(weekofyear(o_orderdate) AS BIGINT)   AS iso_week,
           CAST(dayofyear(o_orderdate) AS BIGINT)    AS doy,
           CAST(epoch(o_orderdate) AS BIGINT)        AS epoch_sec,
           CAST(to_timestamp(epoch(o_orderdate)) AS TIMESTAMP) AS from_epoch
    FROM orders
    WHERE o_orderkey % 53 = 0
    """,
)
def datetime_extract_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUARTER / ISO week / day-of-year / epoch round-trip."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    return o.filter(F.col("o_orderkey") % 53 == 0).select(
        F.quarter("o_orderdate").cast("bigint").alias("qtr"),
        F.weekofyear("o_orderdate").cast("bigint").alias("iso_week"),
        F.dayofyear("o_orderdate").cast("bigint").alias("doy"),
        F.unix_timestamp("o_orderdate").alias("epoch_sec"),
        F.timestamp_seconds(F.unix_timestamp("o_orderdate")).alias("from_epoch"),
    )


@query(
    "like_variants",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority ILIKE '%urgent%'            AS is_urgent_ci,
           o_orderpriority LIKE '%\\_%' ESCAPE '\\'    AS has_underscore,
           o_orderpriority NOT LIKE '1%'               AS not_top
    FROM orders WHERE o_orderkey % 41 = 0
    """,
)
def like_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE family variants: case-insensitive ILIKE, ESCAPE clause,
    NOT LIKE."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    return o.filter(F.col("o_orderkey") % 41 == 0).select(
        "o_orderkey",
        F.col("o_orderpriority").ilike("%urgent%").alias("is_urgent_ci"),
        F.expr("o_orderpriority LIKE '%\\\\_%' ESCAPE '\\\\'").alias("has_underscore"),
        (~F.col("o_orderpriority").like("1%")).alias("not_top"),
    )


@query(
    "time_of_day_encoding",
    oracle="""
    SELECT event_id,
           strftime(ts, '%H:%M:%S')  AS tod,
           CAST(EXTRACT(HOUR FROM ts) * 3600 + EXTRACT(MINUTE FROM ts) * 60
                + EXTRACT(SECOND FROM ts) AS BIGINT) AS sec_of_day
    FROM events
    WHERE event_id % 31 = 0
    """,
)
def time_of_day_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-of-day values (core2's Arrow time type): Spark 4.1 gates
    TIME off (UNSUPPORTED_TIME_TYPE), so the engine uses SURVEY §1.2's
    fallback — canonical string + seconds-since-midnight long."""
    e = load_tables(spark, sf_dir, ("events",))["events"]
    return e.filter(F.col("event_id") % 31 == 0).select(
        "event_id",
        F.date_format("ts", "HH:mm:ss").alias("tod"),
        (
            F.hour("ts").cast("bigint") * 3600
            + F.minute("ts").cast("bigint") * 60
            + F.second("ts").cast("bigint")
        ).alias("sec_of_day"),
    )


@query(
    "with_cte_reuse",
    oracle="""
    WITH seg_stats AS (
        SELECT c_mktsegment AS seg, COUNT(*) AS n_cust,
               ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
                     + 0.000000001, 4) AS seg_bal
        FROM customer GROUP BY c_mktsegment
    )
    SELECT a.seg, a.n_cust, a.seg_bal,
           CAST(a.n_cust - b.n_cust AS BIGINT) AS vs_building
    FROM seg_stats a
    CROSS JOIN (SELECT n_cust FROM seg_stats WHERE seg = 'BUILDING') b
    """,
)
def with_cte_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`:assign` named sub-relations: one CTE referenced twice through
    the SQL frontend (Catalyst decides reuse vs recompute)."""
    register_views(spark, sf_dir, ("customer",))
    return spark.sql(
        """
        WITH seg_stats AS (
            SELECT c_mktsegment AS seg, COUNT(*) AS n_cust,
                   ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
                         + 0.000000001, 4) AS seg_bal
            FROM customer GROUP BY c_mktsegment
        )
        SELECT a.seg, a.n_cust, a.seg_bal,
               CAST(a.n_cust - b.n_cust AS BIGINT) AS vs_building
        FROM seg_stats a
        CROSS JOIN (SELECT n_cust FROM seg_stats WHERE seg = 'BUILDING') b
        """
    )


@query(
    "grouping_sets_sql",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n, {qty} AS qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """.format(qty=sql_dsum("l_quantity")),
)
def grouping_sets_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through the SQL frontend."""
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
                     + 0.000000001, 4) AS qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )
