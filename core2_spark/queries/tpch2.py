"""TPC-H queries 7-22 — the rest of the reference's end-to-end suite.

The reference validated itself with all 22 TPC-H queries in SQL and
Datalog form [upstream: core2 `tpch_test.clj`, `modules/datasets`];
`tpch.py` covers q1-q6/q10/q14/q15/q18/q19, this module the remaining
shapes.  The driver fixture has no `partsupp` table and no
`l_commitdate`/`l_receiptdate`/`l_shipmode`/`c_phone` columns, so each
query keeps its defining *shape* (the operator pattern TPC-H exists to
exercise) with fixture-available stand-ins, documented per query.

Scale notes carried through every query: dimension sides broadcast,
date/brand predicates pushed into the Parquet scan, aggregates partial
before shuffle, self-joins of lineitem co-partitioned on the join key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from core2_spark.catalog import load_tables
from core2_spark.queries.registry import query
from core2_spark.queries.util import dsum, sql_dsum

_REV = "l_extendedprice * (1 - l_discount)"


def _rev_col() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@query(
    "tpch_q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year, {sql_dsum('volume')} AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               EXTRACT(YEAR FROM l.l_shipdate) AS l_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
        JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
        WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
            OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
          AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                               AND TIMESTAMP '1997-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bidirectional nation-pair volume by year.

    The OR-of-nation-pairs predicate can't be pushed below the join, so
    it runs as a residual filter after two broadcast nation joins; the
    only shuffle is lineitem⋈orders and the final 3-key aggregate.
    """
    t = load_tables(
        spark, sf_dir, ("supplier", "lineitem", "orders", "customer", "nation")
    )
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
        | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    )
    return (
        t["lineitem"]
        .filter(
            F.col("l_shipdate").between(
                F.lit("1996-01-01").cast("timestamp"),
                F.lit("1997-12-31").cast("timestamp"),
            )
        )
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(t["customer"]), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nkey") == F.col("s_nationkey"))
        .join(F.broadcast(n2), F.col("c_nkey") == F.col("c_nationkey"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(dsum(_rev_col()).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "tpch_q8_market_share",
    oracle=f"""
    SELECT o_year,
           ROUND(CAST(SUM(CAST(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END
                               AS DECIMAL(38,6))) AS DOUBLE)
                 / CAST(SUM(CAST(volume AS DECIMAL(38,6))) AS DOUBLE)
                 + 0.000000001, 6) AS mkt_share
    FROM (
        SELECT EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume,
               n2.n_name AS nation
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
        JOIN region r   ON n1.n_regionkey = r.r_regionkey
        JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
        WHERE r.r_name = 'REGION_1'
          AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                                AND TIMESTAMP '1997-12-31'
          AND p.p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: national market share — conditional-sum ratio per year
    over a 7-table snowflake (all dimensions broadcast)."""
    t = load_tables(
        spark,
        sf_dir,
        ("part", "supplier", "lineitem", "orders", "customer", "nation", "region"),
    )
    cust_nation = (
        t["nation"]
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "REGION_1")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("c_nkey"))
    )
    supp_nation = t["nation"].select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("nation")
    )
    vol = F.col("volume").cast("decimal(38,6)")
    target = (
        F.when(F.col("nation") == "NATION_3", F.col("volume"))
        .otherwise(F.lit(0.0))
        .cast("decimal(38,6)")
    )
    return (
        t["lineitem"]
        .join(
            t["orders"].filter(
                F.col("o_orderdate").between(
                    F.lit("1996-01-01").cast("timestamp"),
                    F.lit("1997-12-31").cast("timestamp"),
                )
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(
            F.broadcast(t["part"].filter(F.col("p_type") == "ECONOMY")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(t["customer"]), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(cust_nation), F.col("c_nkey") == F.col("c_nationkey"))
        .join(F.broadcast(supp_nation), F.col("s_nkey") == F.col("s_nationkey"))
        .select(
            F.year("o_orderdate").alias("o_year"), _rev_col().alias("volume"), "nation"
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(target).cast("double") / F.sum(vol).cast("double") + 1e-9, 6
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "tpch_q9_product_profit",
    oracle=f"""
    SELECT nation, o_year, {sql_dsum('amount')} AS sum_profit
    FROM (
        SELECT n.n_name AS nation,
               EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
               l.l_extendedprice * (1 - l.l_discount)
                 - 0.5 * p.p_retailprice * l.l_quantity AS amount
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        WHERE p.p_name LIKE '%widget%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and year.

    The fixture has no partsupp.ps_supplycost, so cost is the
    deterministic stand-in `0.5 * p_retailprice * l_quantity` — the
    shape (LIKE-filtered part scan, 5-way join, 2-key agg) is intact.
    """
    t = load_tables(
        spark, sf_dir, ("part", "supplier", "lineitem", "orders", "nation")
    )
    amount = _rev_col() - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].filter(F.col("p_name").like("%widget%"))),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(
            F.broadcast(
                t["nation"].select(
                    F.col("n_nationkey").alias("s_nkey"),
                    F.col("n_name").alias("nation"),
                )
            ),
            F.col("s_nkey") == F.col("s_nationkey"),
        )
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(dsum(amount).alias("sum_profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


@query(
    "tpch_q11_important_stock",
    oracle=f"""
    WITH supply AS (
        SELECT l.l_partkey AS partkey,
               l.l_extendedprice * l.l_quantity AS value
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name = 'NATION_5'
    )
    SELECT partkey, {sql_dsum('value')} AS part_value
    FROM supply
    GROUP BY partkey
    HAVING SUM(CAST(value AS DECIMAL(38,6)))
         > (SELECT SUM(CAST(value AS DECIMAL(38,6))) * 0.005 FROM supply)
    ORDER BY part_value DESC, partkey
    """,
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part supply value vs a scalar fraction of
    the national total (HAVING > scalar subquery).

    No partsupp table: value = l_extendedprice * l_quantity from one
    nation's suppliers.  The scalar total is computed once and
    broadcast; exact decimal sums make the > threshold engine-stable.
    """
    t = load_tables(spark, sf_dir, ("lineitem", "supplier", "nation"))
    supply = (
        t["lineitem"]
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(
            F.broadcast(t["nation"].filter(F.col("n_name") == "NATION_5")),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .select(
            F.col("l_partkey").alias("partkey"),
            (F.col("l_extendedprice") * F.col("l_quantity"))
            .cast("decimal(38,6)")
            .alias("value"),
        )
    )
    per_part = supply.groupBy("partkey").agg(F.sum("value").alias("_dec_value"))
    total = supply.agg((F.sum("value") * F.lit(0.005)).alias("_threshold"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("_dec_value") > F.col("_threshold"))
        .select(
            "partkey",
            F.round(F.col("_dec_value").cast("double") + 1e-9, 4).alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), F.col("partkey"))
    )


@query(
    "tpch_q12_shipmode_priority",
    oracle="""
    SELECT l.l_linestatus AS ship_class,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l.l_linestatus
    ORDER BY ship_class
    """,
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: priority-class line counts per ship mode.

    No l_shipmode/l_commitdate in the fixture: class = l_linestatus,
    "late" = shipped >30 days after order date (non-equi join
    residual); the CASE-pivot double count is the exercised pattern.
    """
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY"))
        .groupBy(F.col("l_linestatus").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


@query(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT OUTER JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority <> '5-LOW'
        GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: customer order-count distribution — LEFT OUTER join
    (zero-order customers must survive as c_count=0) then a second
    aggregate over the first's result."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    return (
        t["customer"]
        .join(
            t["orders"].filter(F.col("o_orderpriority") != "5-LOW"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "tpch_q16_supplier_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type NOT LIKE 'PROMO%'
      AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier counts per (brand, type,
    size) excluding blacklisted suppliers (NOT IN anti join).

    No partsupp: lineitem is the part↔supplier bridge; the complaint
    filter stand-in is negative s_acctbal.  NOT IN over a non-null key
    → plain left_anti (3VL-safe here; the null-key variant is covered
    by subquery_not_in_3vl).
    """
    t = load_tables(spark, sf_dir, ("lineitem", "part", "supplier"))
    bad = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        t["lineitem"]
        .join(
            F.broadcast(
                t["part"].filter(
                    (F.col("p_brand") != "Brand#1")
                    & ~F.col("p_type").like("PROMO%")
                    & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
                )
            ),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(
            F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(),
            F.col("p_brand"),
            F.col("p_type"),
            F.col("p_size"),
        )
    )


@query(
    "tpch_q17_small_quantity_revenue",
    oracle="""
    SELECT ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(38,6)))
                      AS DOUBLE) / 7.0 + 0.000000001, 4) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#2'
      AND l.l_quantity < (
          SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = l.l_partkey
      )
    """,
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: small-quantity order revenue — correlated scalar AVG
    subquery decorrelated into a groupBy + broadcast join back onto
    lineitem (0.5× multiplier keeps the comparison off exact ties)."""
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    li = t["lineitem"]
    avg_qty = (
        li.groupBy(F.col("l_partkey").alias("avg_pkey"))
        .agg((F.lit(0.5) * F.avg("l_quantity")).alias("_half_avg"))
    )
    return (
        li.join(
            F.broadcast(t["part"].filter(F.col("p_brand") == "Brand#2")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(F.broadcast(avg_qty), F.col("avg_pkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("_half_avg"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).cast("double")
                / 7.0
                + 1e-9,
                4,
            ).alias("avg_yearly")
        )
    )


@query(
    "tpch_q20_potential_promotion",
    oracle="""
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_2'
      AND s.s_suppkey IN (
          SELECT l.l_suppkey
          FROM lineitem l
          WHERE l.l_partkey IN (
              SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
          )
            AND l.l_shipdate >= TIMESTAMP '1996-01-01'
            AND l.l_shipdate <  TIMESTAMP '1997-01-01'
          GROUP BY l.l_suppkey, l.l_partkey
          HAVING SUM(l.l_quantity) > 25
      )
    ORDER BY s_name
    """,
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20: nested IN subqueries — parts by name prefix, then
    suppliers who moved >threshold quantity of those parts in a year,
    then the nation filter.  Both INs become semi joins; the inner
    HAVING is a partial-aggregated groupBy."""
    t = load_tables(spark, sf_dir, ("supplier", "nation", "lineitem", "part"))
    red_parts = t["part"].filter(F.col("p_name").like("red%")).select("p_partkey")
    heavy_suppliers = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(F.broadcast(red_parts), F.col("p_partkey") == F.col("l_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .filter(F.col("_qty") > 25)
        .select("l_suppkey")
        .distinct()
    )
    return (
        t["supplier"]
        .join(
            F.broadcast(t["nation"].filter(F.col("n_name") == "NATION_2")),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .join(
            heavy_suppliers, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi"
        )
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@query(
    "tpch_q21_waiting_suppliers",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    JOIN nation n    ON n.n_nationkey = s.s_nationkey
    WHERE o.o_orderstatus = 'F'
      AND n.n_name = 'NATION_1'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    LIMIT 25
    """,
)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21: suppliers who alone were late on multi-supplier
    orders — the EXISTS + NOT-EXISTS double correlation.

    No l_receiptdate/l_commitdate: "late" = shipped >60 days after
    order date.  Both correlated subqueries reduce to one per-order
    aggregate (any-other-supplier, any-other-late-supplier) joined
    back — one shuffle on l_orderkey instead of two self-joins, the
    at-scale rewrite of the textbook plan.
    """
    t = load_tables(spark, sf_dir, ("supplier", "lineitem", "orders", "nation"))
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
    lo = (
        t["lineitem"]
        .join(
            t["orders"].filter(F.col("o_orderstatus") == "F"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select("l_orderkey", "l_suppkey", late.alias("is_late"))
    )
    # Per (order, supplier): was this supplier late on this order?
    per_supp = lo.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("is_late").alias("supp_late"),
        F.sum(F.when(F.col("is_late"), 1).otherwise(0)).alias("n_late_lines"),
    )
    w = Window.partitionBy("l_orderkey")
    flagged = per_supp.select(
        "l_orderkey",
        "l_suppkey",
        "supp_late",
        "n_late_lines",
        F.count("*").over(w).alias("n_suppliers"),
        F.sum(F.when(F.col("supp_late"), 1).otherwise(0)).over(w).alias("n_late_supps"),
    )
    waiting = flagged.filter(
        F.col("supp_late")
        & (F.col("n_suppliers") > 1)
        & (F.col("n_late_supps") == 1)
    )
    line_counts = waiting.select("l_orderkey", "l_suppkey", "n_late_lines")
    return (
        line_counts.join(
            F.broadcast(
                t["supplier"].join(
                    F.broadcast(t["nation"].filter(F.col("n_name") == "NATION_1")),
                    F.col("n_nationkey") == F.col("s_nationkey"),
                )
            ),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(25)
    )


@query(
    "tpch_q22_global_sales_opportunity",
    oracle="""
    WITH positive AS (
        SELECT c_custkey, c_acctbal, c_nationkey % 10 AS cntrycode
        FROM customer
        WHERE c_nationkey % 10 IN (0, 1, 2, 3, 4)
    ),
    threshold AS (
        SELECT AVG(c_acctbal) AS avg_bal FROM positive WHERE c_acctbal > 0.0
    )
    SELECT cntrycode, COUNT(*) AS numcust,
           ROUND(SUM(c_acctbal) + 0.000000001, 4) AS totacctbal
    FROM positive, threshold
    WHERE c_acctbal > avg_bal
      AND NOT EXISTS (
          SELECT 1 FROM orders o WHERE o.o_custkey = positive.c_custkey
      )
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: rich-but-inactive customers per country code.

    No c_phone: country code = c_nationkey % 10.  Pattern intact:
    scalar AVG subquery (broadcast), NOT EXISTS anti join against
    orders, grouped count + sum.
    """
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    positive = t["customer"].select(
        "c_custkey",
        "c_acctbal",
        (F.col("c_nationkey") % 10).alias("cntrycode"),
    ).filter(F.col("cntrycode").isin(0, 1, 2, 3, 4))
    threshold = positive.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        positive.crossJoin(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            t["orders"].select("o_custkey"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal") + 1e-9, 4).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
