"""Constructed-data edge cases for the analytics operators: the random
differentials (test_random_analytics.py) vary PARAMETERS over the
fixture corpus; these vary the DATA — empty relations, constant
series, single-row users — where off-by-one window math, var=0
divisions, or empty-aggregate seeds would crash or diverge.  Each case
still runs the full Spark-vs-DuckDB differential: the constructed
pandas frame is registered as the `events` view on the DuckDB side.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from pyspark.sql import functions as F

from core2_spark.operators.cusum import cusum_alarms, cusum_oracle_sql
from core2_spark.queries.analytics_q import (
    retention_cohorts,
    retention_oracle_sql,
    rolling_actives,
    rolling_actives_oracle_sql,
)
from tests.parity import assert_frames_match

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _events(spark, rows):
    pyrows = [
        (e, ts.to_pydatetime() if isinstance(ts, pd.Timestamp) else ts, u, t, v)
        for e, ts, u, t, v in rows
    ]
    return spark.createDataFrame(pyrows, SCHEMA)


def _pdf(rows):
    return pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    ).astype({"ts": "datetime64[us]"})


def _duck(rows):
    con = duckdb.connect()
    con.register("events", _pdf(rows))
    return con


TS = pd.Timestamp("2024-01-01 12:00:00")


def _compare_all(spark, rows):
    """Run the three data-shape-sensitive pipelines on constructed
    rows, each against its DuckDB mirror."""
    ev = _events(spark, rows)
    con = _duck(rows)
    cases = [
        (
            cusum_alarms(
                ev.filter(F.col("event_type") == "click"),
                series_col="user_id",
                order_col="ts",
                id_col="event_id",
                value_col="value",
                k=5.0,
                h=50.0,
            ),
            cusum_oracle_sql(k=5.0, h=50.0),
            "cusum",
        ),
        (
            retention_cohorts(ev, cohort_min_value=0.0, horizon_days=3),
            retention_oracle_sql(cohort_min_value=0.0, horizon_days=3),
            "retention",
        ),
        (
            rolling_actives(ev, window_days=7),
            rolling_actives_oracle_sql(window_days=7),
            "rolling",
        ),
    ]
    for df, sql, name in cases:
        assert_frames_match(df.toPandas(), con.execute(sql).df(), name)
    con.close()


def test_empty_events(spark):
    _compare_all(spark, [])


def test_constant_series_no_alarms_no_nan(spark):
    """A constant series has var=0 (z-score path must exclude, not
    NaN) and every CUSUM increment is −k ≤ 0, so S stays 0: zero
    alarms, bit-identically on both engines."""
    rows = [
        (i, TS + pd.Timedelta(minutes=i), 1, "click", 42.42) for i in range(20)
    ]
    _compare_all(spark, rows)
    ev = _events(spark, rows)
    alarms = cusum_alarms(
        ev,
        series_col="user_id",
        order_col="ts",
        id_col="event_id",
        value_col="value",
        k=5.0,
        h=0.0,  # even at alarm level 0, constant series never alarms
    )
    assert alarms.count() == 0


def test_single_event_per_user(spark):
    """One event per user: CUSUM C₁ = −n·k < 0 → no alarm; retention
    collapses to offset 0 with rate 1.0; rolling window counts the
    user on all 7 end days clipped to the data's last day."""
    rows = [
        (1, TS, 1, "click", 10.0),
        (2, TS, 2, "purchase", 10.0),
    ]
    _compare_all(spark, rows)


def test_same_instant_ties_are_deterministic(spark):
    """Multiple clicks at the SAME timestamp for one user: the CUSUM
    window order falls back to event_id, so both engines must walk
    the ties identically."""
    rows = [(i, TS, 1, "click", float(100 + 50 * i)) for i in range(8)]
    _compare_all(spark, rows)


def test_spiky_series_alarms_match(spark):
    """A flat series with a late spike run: alarms fire exactly where
    both engines' exact-decimal prefix sums cross n·h."""
    rows = [
        (i, TS + pd.Timedelta(minutes=i), 1, "click", 10.0) for i in range(30)
    ] + [
        (100 + j, TS + pd.Timedelta(minutes=100 + j), 1, "click", 400.0)
        for j in range(6)
    ]
    ev = _events(spark, rows)
    con = _duck(rows)
    sp = cusum_alarms(
        ev,
        series_col="user_id",
        order_col="ts",
        id_col="event_id",
        value_col="value",
        k=5.0,
        h=50.0,
    ).toPandas()
    dk = con.execute(cusum_oracle_sql(k=5.0, h=50.0)).df()
    assert_frames_match(sp, dk, "spike")
    assert len(sp) > 0  # the spike must actually alarm
    con.close()


def test_cusum_nonmonotone_ids_walk_time_order(spark):
    """event_ids deliberately REVERSED against time: the prefix-min
    must walk (ts, id) — the same sequence as the cumulative sum —
    not id order.  With a spike early in time but late in id space,
    an id-ordered min computes a different statistic; both engines
    must agree on the time-ordered one, and the alarms must equal a
    plain-Python replay of the true CUSUM recursion."""
    n = 20
    values = [300.0, 280.0] + [10.0] * (n - 2)  # spike FIRST in time
    rows = [
        (n - i, TS + pd.Timedelta(minutes=i), 1, "click", values[i])
        for i in range(n)
    ]  # ids n..1 descend while time ascends
    ev = _events(spark, rows)
    con = _duck(rows)
    sp = cusum_alarms(
        ev,
        series_col="user_id",
        order_col="ts",
        id_col="event_id",
        value_col="value",
        k=5.0,
        h=50.0,
    ).toPandas()
    dk = con.execute(cusum_oracle_sql(k=5.0, h=50.0)).df()
    assert_frames_match(sp, dk, "nonmonotone-ids")
    con.close()
    # independent ground truth: the textbook recursion in plain Python
    mean = sum(values) / n
    s_stat, alarm_ids = 0.0, []
    for i in range(n):
        s_stat = max(0.0, s_stat + values[i] - mean - 5.0)
        if s_stat > 50.0:
            alarm_ids.append(n - i)
    assert sorted(sp["event_id"]) == sorted(alarm_ids), (
        sorted(sp["event_id"]), sorted(alarm_ids))


def test_bm25_and_linkage_degenerate_inputs(spark):
    """Empty corpus, all-empty-text corpus, and empty customer table:
    the operators must return empty results with the right schema —
    not divide by zero (avgdl), not float(None), not crash."""
    from core2_spark.operators.bm25 import bm25_topk
    from core2_spark.operators.linkage import blocked_fuzzy_pairs

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    out = bm25_topk(empty_docs, ("spark",))
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "bm25_score", "matched_terms"]

    blank_docs = spark.createDataFrame(
        [(1, ""), (2, "")], "doc_id long, text string")
    assert bm25_topk(blank_docs, ("spark",)).count() == 0

    empty_cust = spark.createDataFrame(
        [], "c_custkey long, c_name string, c_nationkey int")
    assert blocked_fuzzy_pairs(
        empty_cust, key_col="c_custkey", name_col="c_name",
        block_cols=("c_nationkey",)).count() == 0
