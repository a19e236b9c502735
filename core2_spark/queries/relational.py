"""Core relational operators: project/select/rename/distinct + scalar
expression families (SURVEY.md §2.2, §2.8).

core2 registers these one-per-namespace [upstream: core2
`operator/project.clj`, `operator/select.clj`, `operator/rename.clj`,
`expression.clj`]; here each is the corresponding Catalyst-native
DataFrame form, so predicate pushdown / column pruning / codegen come
from the optimizer.  3-valued logic (reference README.adoc:13) is
Spark-native; the fixtures have no NULLs so the 3VL queries derive them
via NULLIF the same way on both engine sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from core2_spark.catalog import load_tables
from core2_spark.queries.registry import query
from core2_spark.queries.util import fround, pround


@query(
    "project_compute",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND((l_extendedprice * (1 - l_discount)) + 0.000000001, 4) AS disc_price,
           ROUND((l_extendedprice * (1 - l_discount) * (1 + l_tax)) + 0.000000001, 4)
                                                                      AS charge,
           CAST(l_quantity AS BIGINT)                                 AS qty_int
    FROM lineitem
    WHERE l_quantity >= 45
    """,
)
def project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """π with extend-projections: computed scalar columns + pruning."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return li.filter(F.col("l_quantity") >= 45).select(
        "l_orderkey",
        "l_linenumber",
        pround(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("disc_price"),
        pround(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
        ).alias("charge"),
        F.col("l_quantity").cast("bigint").alias("qty_int"),
    )


@query(
    "select_compound_predicate",
    oracle="""
    SELECT o_orderkey, o_orderstatus, ROUND(o_totalprice, 4) AS o_totalprice
    FROM orders
    WHERE (o_orderstatus = 'F' OR o_totalprice > 400000)
      AND NOT (o_orderpriority IN ('5-LOW', '4-NOT SPECIFIED'))
      AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1999-12-31'
    """,
)
def select_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """σ with AND/OR/NOT, IN-list, BETWEEN — one Catalyst predicate."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    return o.filter(
        ((F.col("o_orderstatus") == "F") | (F.col("o_totalprice") > 400000))
        & ~F.col("o_orderpriority").isin("5-LOW", "4-NOT SPECIFIED")
        & F.col("o_orderdate").between(
            F.lit("1996-01-01").cast("timestamp"), F.lit("1999-12-31").cast("timestamp")
        )
    ).select(
        "o_orderkey", "o_orderstatus", fround("o_totalprice").alias("o_totalprice")
    )


@query(
    "rename_columns",
    oracle="""
    SELECT c_custkey AS customer_id, c_name AS customer_name,
           c_mktsegment AS segment
    FROM customer
    WHERE c_acctbal < 0
    """,
)
def rename_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ρ — column rename / relation alias."""
    c = load_tables(spark, sf_dir, ("customer",))["customer"]
    return (
        c.filter(F.col("c_acctbal") < 0)
        .withColumnRenamed("c_custkey", "customer_id")
        .withColumnRenamed("c_name", "customer_name")
        .withColumnRenamed("c_mktsegment", "segment")
        .select("customer_id", "customer_name", "segment")
    )


@query(
    "distinct_rows",
    oracle="""
    SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
    """,
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """δ — bag → set."""
    c = load_tables(spark, sf_dir, ("customer",))["customer"]
    return c.select("c_mktsegment", "c_nationkey").distinct()


@query(
    "case_when",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 400000 THEN 'high'
                WHEN o_totalprice > 150000 THEN 'mid'
                ELSE 'low' END AS price_band,
           CASE o_orderstatus WHEN 'O' THEN 'open'
                              WHEN 'F' THEN 'filled'
                              ELSE 'other' END AS status_label
    FROM orders
    WHERE o_orderkey % 10 = 0
    """,
)
def case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Searched + simple CASE (core2 expression.clj CASE forms)."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    return o.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 400000, "high")
        .when(F.col("o_totalprice") > 150000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.when(F.col("o_orderstatus") == "O", "open")
        .when(F.col("o_orderstatus") == "F", "filled")
        .otherwise("other")
        .alias("status_label"),
    )


@query(
    "null_three_valued_logic",
    oracle="""
    SELECT
      COUNT(*)                                        AS n_rows,
      COUNT(NULLIF(l_discount, 0.0))                  AS n_nonzero_disc,
      CAST(SUM(CASE WHEN NULLIF(l_discount, 0.0) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
      CAST(SUM(CASE WHEN (NULLIF(l_discount, 0.0) > 0.05) IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                                                      AS n_unknown_cmp,
      COUNT(CASE WHEN l_discount IS NOT DISTINCT FROM 0.0 THEN 1 END)
                                                      AS n_nullsafe_zero
    FROM lineitem
    """,
)
def null_3vl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3VL (reference README.adoc:13): NULL-producing NULLIF, UNKNOWN
    comparisons, null-safe equality (<=> / IS NOT DISTINCT FROM)."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    nz = F.nullif(F.col("l_discount"), F.lit(0.0))
    return li.agg(
        F.count("*").alias("n_rows"),
        F.count(nz).alias("n_nonzero_disc"),
        F.sum(F.when(nz.isNull(), 1).otherwise(0)).alias("n_null"),
        F.sum(F.when((nz > 0.05).isNull(), 1).otherwise(0)).alias("n_unknown_cmp"),
        F.count(F.when(F.col("l_discount").eqNullSafe(F.lit(0.0)), 1)).alias(
            "n_nullsafe_zero"
        ),
    )


@query(
    "conditional_functions",
    oracle="""
    SELECT c_custkey,
           ROUND(COALESCE(NULLIF(c_acctbal, 0.0), -1.0), 4) AS bal_or_default,
           ROUND(GREATEST(c_acctbal, 0.0), 4)               AS bal_floor0,
           ROUND(LEAST(c_acctbal, 5000.0), 4)               AS bal_cap5k
    FROM customer
    WHERE c_custkey <= 500
    """,
)
def conditional_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COALESCE / NULLIF / GREATEST / LEAST."""
    c = load_tables(spark, sf_dir, ("customer",))["customer"]
    return c.filter(F.col("c_custkey") <= 500).select(
        "c_custkey",
        fround(F.coalesce(F.nullif(F.col("c_acctbal"), F.lit(0.0)), F.lit(-1.0))).alias(
            "bal_or_default"
        ),
        fround(F.greatest(F.col("c_acctbal"), F.lit(0.0))).alias("bal_floor0"),
        fround(F.least(F.col("c_acctbal"), F.lit(5000.0))).alias("bal_cap5k"),
    )


@query(
    "string_functions",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name)                              AS name_upper,
           LOWER(c_mktsegment)                        AS seg_lower,
           LENGTH(c_name)                             AS name_len,
           SUBSTRING(c_name, 1, 8)                    AS name_prefix,
           TRIM(c_name || '  ')                       AS name_trim,
           c_name LIKE 'Customer#00000%'              AS is_low_key,
           POSITION('#' IN c_name)                    AS hash_pos,
           REPLACE(c_name, 'Customer', 'Cust')        AS name_short,
           LPAD(CAST(c_custkey AS VARCHAR), 8, '0')   AS key_padded
    FROM customer
    WHERE c_custkey % 7 = 0
    """,
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: ||, UPPER/LOWER, LENGTH, SUBSTRING, TRIM, LIKE,
    POSITION, REPLACE, LPAD (core2 expression.clj string section)."""
    c = load_tables(spark, sf_dir, ("customer",))["customer"]
    return c.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.trim(F.concat(F.col("c_name"), F.lit("  "))).alias("name_trim"),
        F.col("c_name").like("Customer#00000%").alias("is_low_key"),
        F.instr(F.col("c_name"), "#").cast("bigint").alias("hash_pos"),
        F.regexp_replace("c_name", "Customer", "Cust").alias("name_short"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("key_padded"),
    )


@query(
    "math_functions",
    oracle="""
    SELECT p_partkey,
           ABS(p_retailprice - 950.0)                 AS abs_diff,
           p_partkey % 7                              AS mod7,
           CAST(FLOOR(p_retailprice) AS BIGINT)       AS price_floor,
           CAST(CEIL(p_retailprice) AS BIGINT)        AS price_ceil,
           ROUND(SQRT(p_retailprice), 6)              AS price_sqrt,
           ROUND(LN(p_retailprice), 6)                AS price_ln,
           ROUND(LOG10(p_retailprice), 6)             AS price_log10,
           ROUND(EXP(p_size / 25.0), 6)               AS size_exp,
           ROUND(POWER(p_size, 2), 4)                 AS size_sq,
           ROUND(SIN(p_size / 10.0), 6)               AS size_sin,
           ROUND(ATAN(p_size / 10.0), 6)              AS size_atan
    FROM part
    WHERE p_partkey % 5 = 0
    """,
)
def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic + math family (ABS/MOD/FLOOR/CEIL/SQRT/LN/LOG/EXP/
    POWER/trig), overflow-free on fixture domains."""
    p = load_tables(spark, sf_dir, ("part",))["part"]
    r6 = lambda c: fround(c, 6)  # noqa: E731
    return p.filter(F.col("p_partkey") % 5 == 0).select(
        "p_partkey",
        F.abs(F.col("p_retailprice") - 950.0).alias("abs_diff"),
        (F.col("p_partkey") % 7).alias("mod7"),
        F.floor("p_retailprice").cast("bigint").alias("price_floor"),
        F.ceil("p_retailprice").cast("bigint").alias("price_ceil"),
        r6(F.sqrt("p_retailprice")).alias("price_sqrt"),
        r6(F.log(F.col("p_retailprice"))).alias("price_ln"),
        r6(F.log10("p_retailprice")).alias("price_log10"),
        r6(F.exp(F.col("p_size") / 25.0)).alias("size_exp"),
        fround(F.pow(F.col("p_size"), 2)).alias("size_sq"),
        r6(F.sin(F.col("p_size") / 10.0)).alias("size_sin"),
        r6(F.atan(F.col("p_size") / 10.0)).alias("size_atan"),
    )


@query(
    "cast_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(FLOOR(o_totalprice) AS BIGINT)      AS price_int,
           CAST(o_orderkey AS VARCHAR)              AS key_str,
           CAST(o_orderdate AS DATE)                AS order_date,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_str,
           CAST('42' AS BIGINT)                     AS const_int,
           TRY_CAST(o_orderpriority AS BIGINT)      AS bad_cast
    FROM orders
    WHERE o_orderkey % 11 = 0
    """,
)
def cast_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAST family incl. TRY_CAST lenient mode (→ NULL on failure).

    double→int goes through FLOOR on both sides: Spark CAST truncates
    while DuckDB rounds, so the raw cast is deliberately not used.
    """
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    return o.filter(F.col("o_orderkey") % 11 == 0).select(
        "o_orderkey",
        F.floor("o_totalprice").cast("bigint").alias("price_int"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.col("o_orderdate").cast("date").cast("string").alias("date_str"),
        F.lit("42").cast("bigint").alias("const_int"),
        F.expr("TRY_CAST(o_orderpriority AS BIGINT)").alias("bad_cast"),
    )
