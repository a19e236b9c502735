"""Join surface: all core2 join variants (SURVEY.md §2.3).

core2 implements every variant as a single-node hash join over Arrow
batches [upstream: core2 `operator/join.clj`]; correlated subqueries
become `:apply` + decorrelation [upstream: `operator/apply.clj`,
`sql/plan.clj`].  Here each variant is the native DataFrame join type —
Catalyst picks broadcast / shuffled-hash / sort-merge per side size
(AQE can re-pick at runtime), which is the distributed upgrade of the
reference's fixed hash join.

NOT IN null semantics (3VL) are handled explicitly: a NULL in the
subquery output makes NOT IN yield no rows — the DataFrame rewrite must
check for that, a plain anti-join is NOT EXISTS, not NOT IN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from core2_spark.catalog import load_tables
from core2_spark.queries.registry import query
from core2_spark.queries.util import fround


@query(
    "join_inner_equi",
    oracle="""
    SELECT o.o_orderkey, c.c_name, c.c_mktsegment,
           ROUND(o.o_totalprice, 4) AS o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_totalprice > 450000
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders", "customer"))
    return (
        t["orders"]
        .filter(F.col("o_totalprice") > 450000)
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "o_orderkey",
            "c_name",
            "c_mktsegment",
            fround("o_totalprice").alias("o_totalprice"),
        )
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey,
           COUNT(o.o_orderkey)                        AS n_big_orders,
           ROUND(COALESCE(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 0), 4)
                                                      AS big_total
    FROM customer c
    LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 450000) o
           ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """⟕ — unmatched customers kept with NULL order side (count→0)."""
    t = load_tables(spark, sf_dir, ("orders", "customer"))
    big = t["orders"].filter(F.col("o_totalprice") > 450000)
    return (
        t["customer"]
        .join(big, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_big_orders"),
            F.round(
                F.coalesce(
                    F.sum(F.col("o_totalprice").cast("decimal(38,6)")).cast("double"),
                    F.lit(0.0),
                ),
                4,
            ).alias("big_total"),
        )
    )


@query(
    "join_full_outer",
    oracle="""
    WITH cn AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust
                FROM customer WHERE c_acctbal > 8000 GROUP BY c_nationkey),
         sn AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp
                FROM supplier WHERE s_acctbal > 5000 GROUP BY s_nationkey)
    SELECT COALESCE(cn.nk, sn.nk) AS nationkey, cn.n_cust, sn.n_supp
    FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """⟗ — both-side-unmatched rows survive with NULLs."""
    t = load_tables(spark, sf_dir, ("customer", "supplier"))
    cn = (
        t["customer"]
        .filter(F.col("c_acctbal") > 8000)
        .groupBy(F.col("c_nationkey").alias("c_nk"))
        .agg(F.count("*").alias("n_cust"))
    )
    sn = (
        t["supplier"]
        .filter(F.col("s_acctbal") > 5000)
        .groupBy(F.col("s_nationkey").alias("s_nk"))
        .agg(F.count("*").alias("n_supp"))
    )
    return cn.join(sn, cn.c_nk == sn.s_nk, "full").select(
        F.coalesce("c_nk", "s_nk").alias("nationkey"), "n_cust", "n_supp"
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 470000)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """⋉ EXISTS — left_semi join."""
    t = load_tables(spark, sf_dir, ("orders", "customer"))
    big = t["orders"].filter(F.col("o_totalprice") > 470000)
    return t["customer"].join(
        big, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """▷ NOT EXISTS — left_anti join."""
    t = load_tables(spark, sf_dir, ("orders", "customer"))
    big = t["orders"].filter(F.col("o_totalprice") > 400000)
    return t["customer"].join(
        big, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "join_cross",
    oracle="""
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """× — only ever used on small relations; at scale this is always a
    broadcast nested loop (both sides here are tiny dims)."""
    t = load_tables(spark, sf_dir, ("region", "nation"))
    return t["region"].crossJoin(F.broadcast(t["nation"])).select("r_name", "n_name")


@query(
    "join_theta_nonequi",
    oracle="""
    SELECT s.s_nationkey AS nationkey, COUNT(*) AS n_pairs
    FROM supplier s JOIN customer c
      ON s.s_nationkey = c.c_nationkey AND s.s_acctbal > c.c_acctbal
    GROUP BY s.s_nationkey
    """,
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join: equi key + residual non-equi condition (core2
    extracts the equi part and post-filters the residual — Catalyst
    does exactly the same)."""
    t = load_tables(spark, sf_dir, ("supplier", "customer"))
    return (
        t["supplier"]
        .join(
            t["customer"],
            (F.col("s_nationkey") == F.col("c_nationkey"))
            & (F.col("s_acctbal") > F.col("c_acctbal")),
        )
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_pairs"))
    )


@query(
    "join_nullsafe_equal",
    oracle="""
    SELECT n1.n_nationkey AS a_key, n2.n_nationkey AS b_key
    FROM nation n1 JOIN nation n2
      ON NULLIF(n1.n_regionkey, 0) IS NOT DISTINCT FROM NULLIF(n2.n_regionkey, 0)
    WHERE n1.n_nationkey < n2.n_nationkey
    """,
)
def join_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=>): NULL keys match each other,
    unlike plain = under 3VL."""
    n = load_tables(spark, sf_dir, ("nation",))["nation"]
    n1 = n.select(
        F.col("n_nationkey").alias("a_key"),
        F.nullif(F.col("n_regionkey"), F.lit(0)).alias("a_rk"),
    )
    n2 = n.select(
        F.col("n_nationkey").alias("b_key"),
        F.nullif(F.col("n_regionkey"), F.lit(0)).alias("b_rk"),
    )
    return (
        n1.join(n2, n1.a_rk.eqNullSafe(n2.b_rk))
        .filter(F.col("a_key") < F.col("b_key"))
        .select("a_key", "b_key")
    )


@query(
    "subquery_scalar",
    oracle="""
    SELECT c_custkey, ROUND(c_acctbal, 4) AS c_acctbal
    FROM customer
    WHERE c_acctbal > 2 * (SELECT AVG(c_acctbal) FROM customer)
    """,
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery — core2's `:apply` single-join + `:max-1-row`
    guard [upstream: operator/apply.clj, operator/max_1_row.clj];
    DataFrame form: 1-row aggregate cross-joined (broadcast) then
    filtered — no correlated execution needed."""
    c = load_tables(spark, sf_dir, ("customer",))["customer"]
    avg_bal = c.agg(F.avg("c_acctbal").alias("_avg_bal"))
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > 2 * F.col("_avg_bal"))
        .select("c_custkey", fround("c_acctbal").alias("c_acctbal"))
    )


@query(
    "subquery_in",
    oracle="""
    SELECT p_partkey, p_brand FROM part
    WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
    """,
)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN (subquery) → semi join on the subquery output."""
    t = load_tables(spark, sf_dir, ("part", "lineitem"))
    keys = t["lineitem"].filter(F.col("l_quantity") >= 49).select("l_partkey")
    return t["part"].join(
        keys, F.col("p_partkey") == F.col("l_partkey"), "left_semi"
    ).select("p_partkey", "p_brand")


@query(
    "exists_flag_projection",
    oracle="""
    SELECT c_custkey,
           EXISTS (SELECT 1 FROM orders o
                   WHERE o.o_custkey = c.c_custkey
                     AND o.o_totalprice > 450000) AS has_big_order
    FROM customer c
    WHERE c_custkey <= 400
    """,
)
def exists_flag_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as a projected boolean (not a filter): distributed form
    is a left join against the distinct key set — no correlated
    execution, one shuffle."""
    t = load_tables(spark, sf_dir, ("orders", "customer"))
    big_keys = (
        t["orders"]
        .filter(F.col("o_totalprice") > 450000)
        .select(F.col("o_custkey").alias("k"))
        .distinct()
        .withColumn("_hit", F.lit(True))
    )
    return (
        t["customer"]
        .filter(F.col("c_custkey") <= 400)
        .join(big_keys, F.col("c_custkey") == F.col("k"), "left")
        .select(
            "c_custkey",
            F.coalesce(F.col("_hit"), F.lit(False)).alias("has_big_order"),
        )
    )


@query(
    "subquery_not_in_3vl",
    oracle="""
    SELECT p_partkey FROM part
    WHERE p_partkey NOT IN
      (SELECT NULLIF(l_partkey, 0) FROM lineitem
       WHERE l_quantity >= 49 AND l_suppkey <= 2)
      AND p_partkey <= 500
    """,
)
def subquery_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN with a possibly-NULL subquery (3VL): if any subquery value
    is NULL the whole predicate is UNKNOWN → empty result.  The
    distributed rewrite: compute (has_null, key set) once, then
    anti-join gated on has_null — never a driver-side collect of keys.

    NULLIF(l_partkey, 0) never actually hits (keys start at 1), so the
    subquery is null-free and NOT IN behaves like anti-join here; the
    companion unit test covers the null→empty branch.
    """
    t = load_tables(spark, sf_dir, ("part", "lineitem"))
    sub = (
        t["lineitem"]
        .filter((F.col("l_quantity") >= 49) & (F.col("l_suppkey") <= 2))
        .select(F.nullif(F.col("l_partkey"), F.lit(0)).alias("k"))
    )
    null_flag = sub.agg(
        F.max(F.when(F.col("k").isNull(), 1).otherwise(0)).alias("has_null")
    )
    return (
        t["part"]
        .filter(F.col("p_partkey") <= 500)
        .join(sub.na.drop(), F.col("p_partkey") == F.col("k"), "left_anti")
        .crossJoin(F.broadcast(null_flag))
        .filter(F.coalesce(F.col("has_null"), F.lit(0)) == 0)
        .select("p_partkey")
    )


@query(
    "join_interval_overlap_binned",
    oracle="""
    WITH p AS (
        SELECT event_id AS p_id, user_id, ts AS p_start,
               ts + INTERVAL 10 MINUTE AS p_end
        FROM events WHERE event_type = 'purchase'
    ),
    e AS (
        SELECT event_id AS e_id, user_id AS e_user, ts AS e_start,
               ts + INTERVAL 10 MINUTE AS e_end
        FROM events WHERE event_type = 'error'
    )
    SELECT p.p_id, e.e_id, p.user_id
    FROM p JOIN e
      ON p.user_id = e.e_user
     AND p.p_start < e.e_end AND e.e_start < p.p_end
    """,
)
def join_interval_overlap_binned_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval overlap join via binning (operators/interval_join.py):
    purchase windows × error windows per user — the range-theta join
    expressed as a bin equi-join so it shuffles instead of
    nested-looping; the oracle is the naive overlap join."""
    from core2_spark.operators.interval_join import interval_overlap_join

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    ten_min = F.expr("INTERVAL 10 MINUTES")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        "user_id",
        F.col("ts").alias("p_start"),
        (F.col("ts") + ten_min).alias("p_end"),
    )
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("e_id"),
        "user_id",
        F.col("ts").alias("e_start"),
        (F.col("ts") + ten_min).alias("e_end"),
    )
    return interval_overlap_join(
        p, e, "p_start", "p_end", "e_start", "e_end",
        keys=("user_id",), bin_seconds=600,
    ).select("p_id", "e_id", "user_id")


@query(
    "join_lateral_topk",
    oracle="""
    SELECT c.c_custkey AS cust, o.o_orderkey AS k,
           ROUND(o.o_totalprice, 4) AS price
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders
             WHERE o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) o
    WHERE c.c_custkey % 5 = 0
    """,
)
def join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`:apply` written the modern way — a LATERAL correlated derived
    table with per-outer-row ORDER BY .. LIMIT (top-3 orders per
    customer).  Same SQL text runs on DuckDB as the oracle; Catalyst
    decorrelates the lateral limit into a ranked window under the
    hood, so the plan is the same partitioned top-k the window
    operators produce — no per-row re-execution at scale."""
    from core2_spark.catalog import register_views

    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(
        """
        SELECT c.c_custkey AS cust, o.o_orderkey AS k,
               ROUND(o.o_totalprice, 4) AS price
        FROM customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders
                 WHERE o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) o
        WHERE c.c_custkey % 5 = 0
        """
    )


@query(
    "sql_asof_join_dialect",
    oracle="""
    WITH p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
         c AS (SELECT user_id, ts, value FROM events
               WHERE event_type = 'click')
    SELECT p.event_id, p.user_id, p.ts, c.ts AS click_ts,
           ROUND(c.value, 4) AS click_value
    FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def sql_asof_join_dialect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ASOF JOIN`` as SQL syntax (SURVEY §2.3/§3.1 extension; the
    oracle is DuckDB's NATIVE ASOF JOIN, so the dialect's semantics
    are checked against an independent implementation).  Each purchase
    event is enriched with the user's most recent click at-or-before
    it.  The rewrite (`sql_dialect.rewrite_asof_joins`) compiles the
    join to a union+window matcher plus two hash equi-joins — no range
    join / nested loop appears in the plan, so key-group size never
    goes quadratic at scale."""
    from core2_spark.sql_dialect import sql_with_temporal

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    ).createOrReplaceTempView("_asof_purchases")
    ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    ).createOrReplaceTempView("_asof_clicks")
    return sql_with_temporal(
        spark,
        """
        SELECT p.event_id, p.user_id, p.ts, c.ts AS click_ts,
               ROUND(c.value, 4) AS click_value
        FROM _asof_purchases p ASOF JOIN _asof_clicks c
          ON p.user_id = c.user_id AND p.ts >= c.ts
        """,
    )


@query(
    "sql_asof_left_join_forward",
    oracle="""
    WITH s AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'signup'),
         p AS (SELECT user_id, ts, value FROM events
               WHERE event_type = 'purchase')
    SELECT s.event_id, s.user_id, s.ts, p.ts AS next_purchase_ts,
           ROUND(p.value, 4) AS purchase_value
    FROM s ASOF LEFT JOIN p ON s.user_id = p.user_id AND s.ts <= p.ts
    """,
)
def sql_asof_left_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ASOF LEFT JOIN`` with a forward (``<=``) match condition:
    each signup gets the user's EARLIEST purchase at-or-after it, or
    NULLs when none follows (left rows survive).  Exercises both the
    forward window direction (first/FOLLOWING frame) and the
    outer-join leg of the rewrite against DuckDB's native ASOF LEFT
    JOIN."""
    from core2_spark.sql_dialect import sql_with_temporal

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts"
    ).createOrReplaceTempView("_asof_signups")
    ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    ).createOrReplaceTempView("_asof_fwd_purchases")
    return sql_with_temporal(
        spark,
        """
        SELECT s.event_id, s.user_id, s.ts, p.ts AS next_purchase_ts,
               ROUND(p.value, 4) AS purchase_value
        FROM _asof_signups s ASOF LEFT JOIN _asof_fwd_purchases p
          ON s.user_id = p.user_id AND s.ts <= p.ts
        """,
    )
