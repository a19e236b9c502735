"""One-sided CUSUM changepoint alarms as a reusable operator.

The CUSUM recursion S_t = max(0, S_{t-1} + x_t − μ − k) is not a
windowable aggregate as written, but its prefix-sum identity
S_t = C_t − min(0, min_{j≤t} C_j) with C_t = Σ(x_j − μ − k) IS — so the
"stateful" operator compiles to two running-window passes (cumulative
sum + cumulative min), one shuffle on the series key, no UDF, no
iteration.

Everything before the final display division happens in scaled
decimals (multiply through by the series length n so the mean μ = Σx/n
never divides): cumulative decimal sums are exact under any evaluation
association, making the alarm compare S'_t > n·h exact decimal
arithmetic — bit-identical across engines even though DuckDB evaluates
window sums over a segment tree and Spark accumulates sequentially.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from core2_spark.queries.util import EPS


def cusum_alarms(
    df: DataFrame,
    *,
    series_col: str,
    order_col: str,
    id_col: str,
    value_col: str,
    k: float,
    h: float,
) -> DataFrame:
    """Rows whose one-sided CUSUM statistic (slack ``k``, alarm level
    ``h``, both in value units; μ = the series mean) exceeds ``h``.

    Output: (id_col, series_col, value_col, cusum_stat rounded to 4),
    ordered by id_col.
    """
    dec = F.col(value_col).cast("decimal(18,6)")
    s = df.groupBy(series_col).agg(
        F.count("*").cast("decimal(10,0)").alias("n"),
        F.sum(dec).alias("sx"),
    )
    d = df.join(s, series_col).select(
        id_col,
        series_col,
        value_col,
        order_col,
        "n",
        (
            F.col("n") * dec
            - F.col("sx")
            - F.col("n") * F.lit(k).cast("decimal(18,6)")
        ).alias("dd"),
    )
    w_sum = (
        Window.partitionBy(series_col)
        .orderBy(F.col(order_col).asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # The prefix-min MUST walk the same (order_col, id_col) sequence
    # as the cumulative sum: S_t = C_t − min(0, min_{j≤t} C_j) is only
    # the CUSUM recursion when j ranges over the series order.  An
    # id-ordered min silently computes a different statistic whenever
    # ids are not monotone in time.
    w_min = (
        Window.partitionBy(series_col)
        .orderBy(F.col(order_col).asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = d.withColumn("c", F.sum("dd").over(w_sum))
    cs = c.withColumn(
        "sp",
        F.col("c")
        - F.least(F.lit(0).cast("decimal(38,6)"), F.min("c").over(w_min)),
    )
    return (
        cs.filter(F.col("sp") > F.col("n") * F.lit(h).cast("decimal(18,6)"))
        .select(
            id_col,
            series_col,
            value_col,
            F.round(
                F.col("sp").cast("double") / F.col("n").cast("double") + F.lit(EPS),
                4,
            ).alias("cusum_stat"),
        )
        .orderBy(id_col)
    )


def cusum_oracle_sql(
    *,
    table: str = "events",
    filter_sql: str = "event_type = 'click'",
    series_col: str = "user_id",
    order_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    k: float,
    h: float,
) -> str:
    """DuckDB mirror of :func:`cusum_alarms` (same scaled-decimal
    arithmetic; see module docstring).

    ``filter_sql`` is a raw SQL fragment BY CONTRACT (callers pass a
    predicate, not data) — string *values* embedded in it must be
    pre-quoted by the caller (``queries.util.sql_quote``)."""
    return f"""
    WITH s AS (
        SELECT {series_col},
               CAST(COUNT(*) AS DECIMAL(10,0)) AS n,
               SUM(CAST({value_col} AS DECIMAL(18,6))) AS sx
        FROM {table} WHERE {filter_sql} GROUP BY {series_col}
    ),
    d AS (
        SELECT e.{id_col}, e.{series_col}, e.{value_col}, e.{order_col}, s.n,
               SUM(s.n * CAST(e.{value_col} AS DECIMAL(18,6))
                   - s.sx
                   - s.n * CAST({k!r} AS DECIMAL(18,6)))
                 OVER (PARTITION BY e.{series_col}
                       ORDER BY e.{order_col}, e.{id_col}
                       ROWS UNBOUNDED PRECEDING) AS c
        FROM {table} e JOIN s ON s.{series_col} = e.{series_col}
        WHERE {filter_sql}
    ),
    cs AS (
        SELECT {id_col}, {series_col}, {value_col}, n,
               c - LEAST(CAST(0 AS DECIMAL(38,6)),
                         MIN(c) OVER (PARTITION BY {series_col}
                                      ORDER BY {order_col}, {id_col}
                                      ROWS UNBOUNDED PRECEDING)) AS sp
        FROM d
    )
    SELECT {id_col}, {series_col}, {value_col},
           ROUND(CAST(sp AS DOUBLE) / CAST(n AS DOUBLE) + 0.000000001, 4)
               AS cusum_stat
    FROM cs
    WHERE sp > n * CAST({h!r} AS DECIMAL(18,6))
    ORDER BY {id_col}
    """
