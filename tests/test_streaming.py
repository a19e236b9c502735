"""Structured Streaming execution tests: the streaming twins of the
batch-checked window aggregations, plus the custom stateful operator."""

from __future__ import annotations

from pyspark.sql import functions as F

from core2_spark.catalog import load_table
from core2_spark.streaming.events import (
    _event_stream,
    run_stream_to_memory,
    tumbling_agg,
)
from core2_spark.streaming.stateful import running_user_profile

SF = "/root/testdata/sf0.001"


def test_streaming_tumbling_matches_batch(spark):
    """The streaming tumbling aggregation must equal the batch result
    once the bounded stream drains (exactly-once semantics)."""
    sink = run_stream_to_memory(tumbling_agg(_event_stream(spark, SF)), mode="complete")
    streamed = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in spark.table(sink).collect()
    }
    batch = {
        (r["w"]["start"], r["event_type"]): (r["n"], r["tv"])
        for r in (
            load_table(spark, SF, "events")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("tv"))
            .collect()
        )
    }
    assert streamed == batch


def test_stateful_running_profile(spark):
    """applyInPandasWithState: final per-user state equals the batch
    aggregate after the stream drains."""
    sink = run_stream_to_memory(
        running_user_profile(_event_stream(spark, SF)), mode="update"
    )
    # update mode emits one row per user per micro-batch; the final
    # emission per user carries the converged running state.
    final = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.sql(
            f"""
            SELECT user_id, n_events, total_value FROM (
              SELECT *, ROW_NUMBER() OVER
                (PARTITION BY user_id ORDER BY n_events DESC) AS rn
              FROM {sink}
            ) WHERE rn = 1
            """
        ).collect()
    }
    batch = {
        r["user_id"]: (r["n"], r["tv"])
        for r in (
            load_table(spark, SF, "events")
            .groupBy("user_id")
            .agg(F.count("*").alias("n"), F.sum("value").alias("tv"))
            .collect()
        )
    }
    assert set(final) == set(batch)
    for uid, (n, total) in final.items():
        bn, btv = batch[uid]
        assert n == bn
        assert abs(total - btv) < 1e-3
