"""Ordered-sequence operators over event streams (MATCH_RECOGNIZE-lite).

`funnel` and `consecutive_runs` are the two canonical row-pattern
shapes (SQL:2016 MATCH_RECOGNIZE's `A B C` with time bounds, and
`X{n,}`), compiled to plain joins/windows so Catalyst plans them like
any relational query — no per-row UDFs, no driver-side loops.

Scale: every funnel stage shuffles on the SAME user key (stages stay
co-partitioned after the first exchange) and pushes its event-type
filter to the scan; `consecutive_runs` is two ordered windows and an
aggregate, all partitioned by user, output bounded by user count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def funnel(
    events: DataFrame,
    stages: list[str],
    horizon: str = "INTERVAL 3 DAYS",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered conversion funnel: per user, the first `stages[0]`
    event, then for each later stage the first event STRICTLY AFTER
    the previous stage's matched event and within `horizon` of it.
    Returns one row per stage: (stage_idx, stage, n_users) —
    all-integer, engine-exact."""
    if not stages:
        raise ValueError("funnel: at least one stage")
    cur = (
        events.filter(F.col(type_col) == stages[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_m0"))
    )
    per_stage = [cur]
    for k, stage in enumerate(stages[1:], start=1):
        nxt = events.filter(F.col(type_col) == stage).select(
            user_col, F.col(ts_col).alias("_t")
        )
        prev = f"_m{k - 1}"
        cur = (
            nxt.join(cur, user_col)
            .filter(
                (F.col("_t") > F.col(prev))
                & (F.col("_t") <= F.col(prev) + F.expr(horizon))
            )
            .groupBy(user_col)
            .agg(F.min("_t").alias(f"_m{k}"))
        )
        per_stage.append(cur)

    out = None
    for idx, (stage, df) in enumerate(zip(stages, per_stage), start=1):
        row = df.agg(F.count("*").alias("n_users")).select(
            F.lit(idx).alias("stage_idx"),
            F.lit(stage).alias("stage"),
            F.col("n_users"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("stage_idx")


def consecutive_runs(
    events: DataFrame,
    event_type: str,
    min_run: int = 3,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_cols: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Consecutive-run detection (gaps-and-islands): per user, runs of
    >= `min_run` back-to-back `event_type` events with no other event
    type between (global row number minus per-class row number is
    constant within a run).  Ordering ties broken by `order_cols`.
    Returns (user_id, n_bursts, max_run), deterministically ordered."""
    w_all = Window.partitionBy(user_col).orderBy(ts_col, *order_cols)
    seq = events.select(user_col, type_col, ts_col, *order_cols).withColumn(
        "_rn", F.row_number().over(w_all)
    )
    w_cls = Window.partitionBy(user_col).orderBy("_rn")
    err = seq.filter(F.col(type_col) == event_type).withColumn(
        "_grp", F.col("_rn") - F.row_number().over(w_cls)
    )
    runs = err.groupBy(user_col, "_grp").agg(F.count("*").alias("run_len"))
    return (
        runs.filter(F.col("run_len") >= min_run)
        .groupBy(user_col)
        .agg(
            F.count("*").alias("n_bursts"),
            F.max("run_len").alias("max_run"),
        )
        .orderBy(
            F.col("n_bursts").desc(), F.col("max_run").desc(), F.col(user_col)
        )
    )
