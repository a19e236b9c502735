"""Aggregation surface (SURVEY.md §2.4).

core2 has a single vectorized hash-aggregate [upstream: core2
`operator/group_by.clj`]; Spark's groupBy is the distributed upgrade:
partial (map-side) aggregation before the shuffle, final after — check
``.explain`` for HashAggregate(partial) → Exchange → HashAggregate.
Grouping sets / rollup / cube and the approx sketches are Spark-native
extensions beyond the reference (core2 had none).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from core2_spark.catalog import load_tables
from core2_spark.queries.registry import query
from core2_spark.queries.util import davg, dsum, fround, pround, sql_davg, sql_dsum


@query(
    "agg_basic",
    oracle="""
    SELECT l_returnflag,
           COUNT(*)                      AS n_rows,
           COUNT(l_quantity)             AS n_qty,
           {sum_qty}                     AS sum_qty,
           {avg_price}                   AS avg_price,
           ROUND(MIN(l_extendedprice), 4) AS min_price,
           ROUND(MAX(l_extendedprice), 4) AS max_price
    FROM lineitem GROUP BY l_returnflag
    """.format(sum_qty=sql_dsum("l_quantity"), avg_price=sql_davg("l_extendedprice")),
)
def agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.count("l_quantity").alias("n_qty"),
        dsum("l_quantity").alias("sum_qty"),
        davg("l_extendedprice").alias("avg_price"),
        fround(F.min("l_extendedprice")).alias("min_price"),
        fround(F.max("l_extendedprice")).alias("max_price"),
    )


@query(
    "agg_distinct",
    oracle="""
    SELECT l_linestatus,
           COUNT(DISTINCT l_suppkey)                 AS n_supp,
           COUNT(DISTINCT l_partkey)                 AS n_part,
           ROUND(CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE), 4)
                                                     AS sum_dist_qty,
           ROUND(CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
                 / COUNT(DISTINCT l_quantity), 4)    AS avg_dist_qty
    FROM lineitem GROUP BY l_linestatus
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    dist_sum = F.sum_distinct(F.col("l_quantity").cast("decimal(38,6)")).cast("double")
    return li.groupBy("l_linestatus").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.round(dist_sum, 4).alias("sum_dist_qty"),
        F.round(dist_sum / F.countDistinct("l_quantity"), 4).alias("avg_dist_qty"),
    )


@query(
    "agg_stats",
    oracle="""
    SELECT c_mktsegment,
           ROUND(VAR_POP(c_acctbal), 2)     AS var_pop_bal,
           ROUND(VAR_SAMP(c_acctbal), 2)    AS var_samp_bal,
           ROUND(STDDEV_POP(c_acctbal), 4)  AS stddev_pop_bal,
           ROUND(STDDEV_SAMP(c_acctbal), 4) AS stddev_samp_bal
    FROM customer GROUP BY c_mktsegment
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_tables(spark, sf_dir, ("customer",))["customer"]
    return c.groupBy("c_mktsegment").agg(
        fround(F.var_pop("c_acctbal"), 2).alias("var_pop_bal"),
        fround(F.var_samp("c_acctbal"), 2).alias("var_samp_bal"),
        fround(F.stddev_pop("c_acctbal")).alias("stddev_pop_bal"),
        fround(F.stddev_samp("c_acctbal")).alias("stddev_samp_bal"),
    )


@query(
    "agg_bool",
    oracle="""
    SELECT o_orderstatus,
           BOOL_AND(o_totalprice > 2000)   AS all_over_2k,
           BOOL_OR(o_totalprice > 490000)  AS any_over_490k
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL EVERY/ANY — core2 exposes bool-and/bool-or."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    return o.groupBy("o_orderstatus").agg(
        F.bool_and(F.col("o_totalprice") > 2000).alias("all_over_2k"),
        F.bool_or(F.col("o_totalprice") > 490000).alias("any_over_490k"),
    )


@query(
    "agg_array_agg",
    oracle="""
    SELECT n_regionkey, STRING_AGG(n_name, ',' ORDER BY n_name) AS nations
    FROM nation GROUP BY n_regionkey
    """,
)
def agg_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARRAY_AGG (core2 array-agg) — emitted as a sorted joined string
    so the hash compare is order-deterministic."""
    n = load_tables(spark, sf_dir, ("nation",))["nation"]
    return n.groupBy("n_regionkey").agg(
        F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias("nations")
    )


@query(
    "agg_count_if_filtered",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE l_discount > 0.05)       AS n_high_disc,
           CAST(SUM(CASE WHEN l_tax = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_no_tax
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_count_if(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered aggregates (COUNT FILTER / count_if)."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_discount") > 0.05).alias("n_high_disc"),
        F.sum(F.when(F.col("l_tax") == 0, 1).otherwise(0)).alias("n_no_tax"),
    )


@query(
    "agg_having",
    oracle="""
    SELECT l_suppkey, {rev} AS supp_revenue
    FROM lineitem
    GROUP BY l_suppkey
    HAVING CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) > 10000000
       AND COUNT(*) > 100
    """.format(rev=sql_dsum("l_extendedprice")),
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING — filter over aggregate outputs."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return (
        li.groupBy("l_suppkey")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(38,6)"))
            .cast("double")
            .alias("_rev"),
            F.count("*").alias("_n"),
        )
        .filter((F.col("_rev") > 10000000) & (F.col("_n") > 100))
        .select("l_suppkey", pround("_rev").alias("supp_revenue"))
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS BIGINT) * 2
             + CAST(GROUPING(l_linestatus) AS BIGINT) AS gid,
           {sum_qty} AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """.format(sum_qty=sql_dsum("l_quantity")),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (Spark-native extension; core2 had no
    grouping sets)."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping_id().cast("bigint").alias("gid"),
        dsum("l_quantity").alias("sum_qty"),
    ).select("l_returnflag", "l_linestatus", "gid", "sum_qty")


@query(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n, {total} AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """.format(total=sql_dsum("o_totalprice")),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE — all grouping-set combinations."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"), dsum("o_totalprice").alias("total")
    )


@query(
    "agg_percentile_exact",
    oracle="""
    SELECT c_mktsegment,
           ROUND(MEDIAN(c_acctbal), 4)                       AS median_bal,
           ROUND(QUANTILE_CONT(c_acctbal, 0.9), 4)           AS p90_bal
    FROM customer GROUP BY c_mktsegment
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median / p90)."""
    c = load_tables(spark, sf_dir, ("customer",))["customer"]
    return c.groupBy("c_mktsegment").agg(
        fround(F.percentile("c_acctbal", 0.5)).alias("median_bal"),
        fround(F.percentile("c_acctbal", 0.9)).alias("p90_bal"),
    )


@query(
    "agg_min_by_max_by",
    oracle="""
    SELECT c_mktsegment,
           arg_min(c_name, c_acctbal)  AS poorest,
           arg_max(c_name, c_acctbal)  AS richest,
           ROUND(corr(c_acctbal, CAST(c_custkey AS DOUBLE)), 4) AS bal_key_corr
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def agg_min_by_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN_BY / MAX_BY (argmin/argmax) + Pearson correlation."""
    c = load_tables(spark, sf_dir, ("customer",))["customer"]
    return c.groupBy("c_mktsegment").agg(
        F.min_by("c_name", "c_acctbal").alias("poorest"),
        F.max_by("c_name", "c_acctbal").alias("richest"),
        fround(F.corr("c_acctbal", F.col("c_custkey").cast("double"))).alias(
            "bal_key_corr"
        ),
    )


@query(
    "agg_approx_sketches",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           TRUE AS hll_within_10pct,
           TRUE AS approx_median_in_band
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate sketches (HLL distinct, approx quantile) — Spark
    freebies beyond the reference (cf. quantile-sketch literature,
    PAPERS.md).

    Upgraded from rows-only to a value oracle: the sketch ESTIMATES
    are engine-specific (DuckDB cannot reproduce Spark's HLL or
    KLL-ish percentile internals), but their error CONTRACTS are
    checkable — the query emits exact group stats beside booleans
    asserting each sketch landed inside its bound:

    - HLL (default rsd=0.05): |approx − exact| / exact ≤ 0.10;
    - percentile_approx(accuracy=1000) guarantees rank error ≤ 1/1000,
      so the approx median's TRUE rank interval [#(<v)/n, #(≤v)/n]
      must intersect [0.45, 0.55] — verified by COUNTING around the
      estimate (integer arithmetic, exact) rather than computing an
      exact percentile, because Spark's exact `percentile` buffers
      every group value in the agg buffer and OOMs at sf1 — the
      count-based rank check is one extra broadcast-join + aggregate
      and scales to any group size.

    Both sketches are deterministic for a fixed dataset, so a FALSE
    is a real regression, never flake.  The oracle pins the exact
    columns and TRUE for the bound checks.

    r11 (guide §2.3 two-level aggregation): countDistinct may NOT sit
    in the same groupBy as the sketch aggregates — Spark plans a
    mixed distinct/non-distinct aggregate by RE-KEYING the first
    aggregate level on (l_returnflag, l_partkey), so every one of the
    ~60k fine-grained groups allocates, serializes and shuffles the
    52-word HLL register array PLUS a percentile_approx sketch buffer
    (a 56-column ObjectHashAggregate row, through TWO exchanges — see
    plans/r11/agg_approx_sketches_before.txt nodes 5–10; measured at
    sf0.1: 4.1–4.9 s combined vs 0.4–0.8 s for each aggregate alone).
    Splitting the exact distinct into its own narrow two-level
    aggregate and joining the two 3-row results keeps every sketch
    buffer keyed by flag only (3 groups, one buffer per task):
    0.9–1.5 s, same declared output.  The internal approx_median
    estimate shifts within its guaranteed 1/1000 rank band under the
    changed merge tree — it is not emitted; the emitted band boolean
    has 50× margin (rank error 0.001 vs band half-width 0.05) and the
    exact columns are exact."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    sketches = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("approx_median"),
        F.count("*").alias("n_rows"),
    )
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
    sk = sketches.join(exact, "l_returnflag")
    # carry the sketch columns THROUGH the rank aggregate (F.first per
    # group) instead of re-joining sk afterwards — sk's heavy
    # countDistinct + percentile aggregate would otherwise recompute
    # from lineage on the second reference
    ranks = (
        li.join(F.broadcast(sk), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.sum(
                (F.col("l_extendedprice") < F.col("approx_median")).cast("long")
            ).alias("cnt_lt"),
            F.sum(
                (F.col("l_extendedprice") <= F.col("approx_median")).cast("long")
            ).alias("cnt_le"),
            F.first("approx_parts").alias("approx_parts"),
            F.first("exact_parts").alias("exact_parts"),
            F.first("n_rows").alias("n_rows"),
        )
    )
    return (
        ranks
        .select(
            "l_returnflag",
            "exact_parts",
            "n_rows",
            (
                F.abs(F.col("approx_parts") - F.col("exact_parts"))
                * F.lit(10)
                <= F.col("exact_parts")
            ).alias("hll_within_10pct"),
            # rank interval of the estimate must intersect [0.45, 0.55]:
            # #(<v)/n <= 0.55  AND  #(<=v)/n >= 0.45, in exact integers
            (
                (F.col("cnt_lt") * 100 <= F.col("n_rows") * 55)
                & (F.col("cnt_le") * 100 >= F.col("n_rows") * 45)
            ).alias("approx_median_in_band"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n, {total} AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """.format(total=sql_dsum("o_totalprice")),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — arbitrary set list, not the ROLLUP/CUBE
    hierarchies (completes §2.4's grouping-set family)."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    o.createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
                     + 0.000000001, 4) AS total
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )
