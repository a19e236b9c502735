"""Sort / limit / offset + bag set-operations (SURVEY.md §2.5, §2.6).

core2: in-memory multi-key sort [upstream: core2 `operator/order_by.clj`],
OFFSET/FETCH slice [upstream: `operator/top.clj`], bag-semantic set ops
[upstream: `operator/set_op.clj`] per SQL standard (reference
README.adoc:13 "bag/multiset semantics").  Spark upgrades: external
spillable sort, TakeOrderedAndProject for top-k, unionByName for
dynamic schemas, intersectAll/exceptAll for true bag semantics.

Every LIMIT/OFFSET query totally orders its rows (unique tiebreak key)
so both engines slice identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from core2_spark.catalog import load_tables
from core2_spark.queries.registry import query
from core2_spark.queries.util import fround


@query(
    "orderby_multi_key_limit",
    oracle="""
    SELECT c_custkey, c_mktsegment, ROUND(c_acctbal, 4) AS c_acctbal
    FROM customer
    ORDER BY c_mktsegment ASC, ROUND(c_acctbal, 4) DESC, c_custkey ASC
    LIMIT 50
    """,
)
def orderby_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key ORDER BY (asc+desc) with top-k fusion."""
    c = load_tables(spark, sf_dir, ("customer",))["customer"]
    return (
        c.select("c_custkey", "c_mktsegment", fround("c_acctbal").alias("c_acctbal"))
        .orderBy(F.col("c_mktsegment").asc(), F.col("c_acctbal").desc(), F.col("c_custkey").asc())
        .limit(50)
    )


@query(
    "orderby_nulls_first",
    oracle="""
    SELECT s_suppkey, ROUND(NULLIF(s_acctbal, 0.0), 4) AS bal_or_null
    FROM supplier
    ORDER BY bal_or_null ASC NULLS FIRST, s_suppkey ASC
    LIMIT 30
    """,
)
def orderby_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULLS FIRST ordering (core2/SQL null ordering is
    explicit; Spark default differs per direction so it is always
    spelled out)."""
    s = load_tables(spark, sf_dir, ("supplier",))["supplier"]
    return (
        s.select(
            "s_suppkey",
            fround(F.nullif(F.col("s_acctbal"), F.lit(0.0))).alias("bal_or_null"),
        )
        .orderBy(F.col("bal_or_null").asc_nulls_first(), F.col("s_suppkey").asc())
        .limit(30)
    )


@query(
    "limit_offset",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 4) AS o_totalprice
    FROM orders
    ORDER BY ROUND(o_totalprice, 4) DESC, o_orderkey ASC
    LIMIT 15 OFFSET 10
    """,
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OFFSET n FETCH FIRST m (core2 `:top` slice)."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    return (
        o.select("o_orderkey", fround("o_totalprice").alias("o_totalprice"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .offset(10)
        .limit(15)
    )


@query(
    "set_union_all",
    oracle="""
    SELECT c_custkey AS custkey, c_mktsegment AS tag FROM customer WHERE c_acctbal > 9000
    UNION ALL
    SELECT c_custkey AS custkey, 'NEGATIVE' AS tag FROM customer WHERE c_acctbal < 0
    UNION ALL
    SELECT c_custkey AS custkey, c_mktsegment AS tag FROM customer WHERE c_acctbal > 9500
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL keeps duplicates (bag); unionByName handles evolving
    schemas (allowMissingColumns for dynamic docs)."""
    c = load_tables(spark, sf_dir, ("customer",))["customer"]
    a = c.filter(F.col("c_acctbal") > 9000).select(
        F.col("c_custkey").alias("custkey"), F.col("c_mktsegment").alias("tag")
    )
    b = c.filter(F.col("c_acctbal") < 0).select(
        F.col("c_custkey").alias("custkey"), F.lit("NEGATIVE").alias("tag")
    )
    d = c.filter(F.col("c_acctbal") > 9500).select(
        F.col("c_custkey").alias("custkey"), F.col("c_mktsegment").alias("tag")
    )
    return a.unionByName(b).unionByName(d)


@query(
    "set_intersect_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_totalprice > 250000
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag intersection with multiplicity min()."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_totalprice") > 250000).select("o_custkey")
    return a.intersectAll(b)


@query(
    "set_except_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_totalprice > 250000
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag difference with multiplicity subtraction."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_totalprice") > 250000).select("o_custkey")
    return a.exceptAll(b)


@query(
    "set_intersect_distinct",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_totalprice > 250000
    """,
)
def set_intersect_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (set) — multiplicities collapse."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_totalprice") > 250000).select("o_custkey")
    return a.intersect(b)


@query(
    "set_except_distinct",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_totalprice > 250000
    """,
)
def set_except_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set) — distinct difference."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_totalprice") > 250000).select("o_custkey")
    return a.subtract(b)


@query(
    "set_union_by_name_missing",
    oracle="""
    SELECT c_custkey AS entity_id, c_name AS label, c_acctbal AS bal
    FROM customer WHERE c_acctbal > 9900
    UNION ALL BY NAME
    SELECT s_suppkey AS entity_id, s_name AS label
    FROM supplier WHERE s_acctbal > 9000
    """,
)
def set_union_by_name_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-schema union: BY NAME with missing columns → NULL
    (core2's absent-field semantics when uniting evolving documents)."""
    t = load_tables(spark, sf_dir, ("customer", "supplier"))
    a = t["customer"].filter(F.col("c_acctbal") > 9900).select(
        F.col("c_custkey").alias("entity_id"),
        F.col("c_name").alias("label"),
        F.col("c_acctbal").alias("bal"),
    )
    b = t["supplier"].filter(F.col("s_acctbal") > 9000).select(
        F.col("s_suppkey").alias("entity_id"),
        F.col("s_name").alias("label"),
    )
    return a.unionByName(b, allowMissingColumns=True)


@query(
    "set_union_distinct",
    oracle="""
    SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 9000
    UNION
    SELECT s_nationkey AS nk FROM supplier WHERE s_acctbal > 9000
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) — union-all then δ."""
    t = load_tables(spark, sf_dir, ("customer", "supplier"))
    a = t["customer"].filter(F.col("c_acctbal") > 9000).select(
        F.col("c_nationkey").alias("nk")
    )
    b = t["supplier"].filter(F.col("s_acctbal") > 9000).select(
        F.col("s_nationkey").alias("nk")
    )
    return a.unionByName(b).distinct()
