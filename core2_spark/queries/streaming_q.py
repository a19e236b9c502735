"""Event-time windowing — batch forms (SURVEY.md §2.10).

core2 has no event-time streaming: its "watermark" is a consistent
snapshot handle [upstream: core2 `watermark.clj`], and continuous
behavior lives in the tx log.  These queries are the Spark-native
extension: tumbling / sliding / session windows computed in *batch* so
the DuckDB oracle can verify them; `core2_spark.streaming.events`
wraps the same aggregations as true Structured Streaming queries
(readStream + withWatermark), checked by unit tests instead.

Timestamp discipline: the events fixture's ``ts`` may be ns (legacy
generations, truncated to µs on read) or µs-NTZ (current); both are
normalized to TimestampType by ``catalog.normalize_event_ts``.  Every
derived time column passes through date_trunc('second') on both sides
before comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from core2_spark.catalog import load_tables
from core2_spark.queries.registry import query
from core2_spark.queries.util import davg, dsum, sql_davg, sql_dsum


@query(
    "stream_tumbling_window",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n,
           {total_value} AS total_value
    FROM events
    GROUP BY 1, 2
    """.format(total_value=sql_dsum("value")),
)
def tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation (F.window), batch form."""
    e = load_tables(spark, sf_dir, ("events",))["events"]
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@query(
    "stream_sliding_window",
    oracle="""
    WITH offsets AS (SELECT * FROM (VALUES (0), (1)) t(h))
    SELECT date_trunc('hour', ts) - h * INTERVAL 1 HOUR AS window_start,
           COUNT(*) AS n,
           {avg_value} AS avg_value
    FROM events, offsets
    GROUP BY 1
    """.format(avg_value=sql_davg("value")),
)
def sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window: 2-hour length, 1-hour slide — each event lands
    in two windows (oracle reproduces via the 2-offset expansion)."""
    e = load_tables(spark, sf_dir, ("events",))["events"]
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"), davg("value").alias("avg_value"))
        .select(F.col("w.start").alias("window_start"), "n", "avg_value")
    )


@query(
    "stream_session_window",
    oracle="""
    WITH e AS (
        SELECT user_id, date_trunc('second', ts) AS ts, value FROM events
    ),
    flagged AS (
        SELECT user_id, ts, value,
               -- Spark's session_window merges an event landing exactly
               -- on the session end (start <= end inclusive), so the
               -- gap comparison here is <=, not <.
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         <= INTERVAL 10 MINUTE
                    THEN 0 ELSE 1 END AS new_session
        FROM e
    ),
    sessions AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER
                 (PARTITION BY user_id ORDER BY ts
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM flagged
    )
    SELECT user_id,
           MIN(ts)                        AS session_start,
           MAX(ts) + INTERVAL 10 MINUTE   AS session_end,
           COUNT(*) AS n_events,
           {session_value} AS session_value
    FROM sessions
    GROUP BY user_id, session_id
    """.format(session_value=sql_dsum("value")),
)
def session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (10-minute gap) in batch via F.session_window;
    the oracle derives identical sessions with the gaps-and-islands
    construction (lag + cumulative sum) — a genuine cross-check of the
    semantics, per SURVEY.md §7 M6."""
    e = load_tables(spark, sf_dir, ("events",))["events"]
    sec = F.date_trunc("second", F.col("ts"))
    return (
        e.withColumn("ts2", sec)
        .groupBy(F.session_window("ts2", "10 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("session_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


@query(
    "stream_structured_tumbling",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n,
           {total_value} AS total_value
    FROM events
    GROUP BY 1, 2
    """.format(total_value=sql_dsum("value")),
)
def structured_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same tumbling aggregation executed as a real Structured
    Streaming query (readStream over the parquet dir, watermark, memory
    sink).  Full value-hash oracle: a bounded drained stream with
    complete-mode output must equal the batch answer EXACTLY
    (exactly-once semantics), and the dsum discipline inside
    tumbling_agg makes the doubles bit-identical to DuckDB's — so the
    weaker rows-only check the driver used through r8 is retired."""
    from core2_spark.streaming.events import run_tumbling_batch

    return run_tumbling_batch(spark, sf_dir)


@query(
    "stream_kafka_log_transport",
    oracle="""
    SELECT 'core2-log' AS topic,
           CAST(user_id % 4 AS INT) AS "partition",
           CAST(COUNT(*) AS BIGINT) AS n_records,
           CAST(MAX(event_id) AS BIGINT) AS max_offset,
           CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
                AS BIGINT) AS n_purchases
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_kafka_log_transport_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kafka-shaped log ingestion end-to-end: wire records (auto
    transport — Kafka when a broker+connector exist, the wire-identical
    file twin here) decoded like a Kafka consumer, then aggregated per
    (topic, partition) with max offset — the consumer-group bookkeeping
    view.  Full value-hash oracle (upgraded from rows-only in r9): the
    key%n partitioner is cross-engine-deterministic, so DuckDB derives
    the same consumer-group view straight from the events table — which
    checks the whole encode→stream→decode round-trip byte-for-byte at
    the aggregate level (a mis-decoded event_type or offset mismatches
    the hash)."""
    from core2_spark.streaming.events import run_stream_to_memory
    from core2_spark.streaming.log_transport import parse_log_records, read_log_stream

    wire = read_log_stream(spark, "auto", sf_dir=sf_dir)
    parsed = parse_log_records(wire)
    agg = parsed.groupBy("topic", "partition").agg(
        F.count("*").alias("n_records"),
        F.max("offset").alias("max_offset"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("n_purchases"),
    )
    sink = run_stream_to_memory(agg, mode="complete")
    return spark.table(sink)


@query(
    "stream_interval_join_batch_twin",
    oracle="""
    SELECT p.event_id AS p_id, e.event_id AS e_id
    FROM events p JOIN events e
      ON p.user_id = e.user_id
     AND e.ts <= p.ts
     AND e.ts >  p.ts - INTERVAL 10 MINUTE
    WHERE p.event_type = 'purchase' AND e.event_type = 'error'
    """,
)
def stream_interval_join_batch_twin_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream interval join
    (tests/test_streaming.py::test_stream_stream_join_matches_batch —
    purchases joined to the same user's errors in the preceding 10
    minutes).  The streaming form adds watermarks on both sides; the
    join condition and result set are identical, which is exactly the
    property the streaming test asserts."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), F.col("event_id").alias("p_id")
    )
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"),
        F.col("event_id").alias("e_id"),
    )
    return p.join(
        e,
        (F.col("user_id") == F.col("e_user"))
        & (F.col("e_ts") <= F.col("p_ts"))
        & (F.col("e_ts") > F.col("p_ts") - F.expr("INTERVAL 10 MINUTES")),
    ).select("p_id", "e_id")


@query(
    "stream_stateful_sessions",
    oracle="""
    WITH e AS (
        SELECT user_id, date_trunc('second', ts) AS ts, value FROM events
    ),
    flagged AS (
        SELECT user_id, ts, value,
               -- inclusive gap (<=), matching both F.session_window and
               -- the stateful operator's boundary-merge rule
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         <= INTERVAL 10 MINUTE
                    THEN 0 ELSE 1 END AS new_session
        FROM e
    ),
    sessions AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER
                 (PARTITION BY user_id ORDER BY ts
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM flagged
    ),
    agg AS (
        SELECT user_id, sid,
               MIN(ts)                      AS session_start,
               MAX(ts) + INTERVAL 10 MINUTE AS session_end,
               CAST(COUNT(*) AS BIGINT)     AS n_events,
               -- outer cast: DuckDB SUM(BIGINT) is HUGEINT, which
               -- pandas renders as float and breaks the value hash
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                 AS value_cents
        FROM sessions
        GROUP BY user_id, sid
    )
    SELECT user_id, session_start, session_end, n_events, value_cents
    FROM agg
    -- the stateful operator holds each user's FINAL session open in
    -- GroupState at end-of-stream (it might still grow); only closed
    -- sessions are emitted
    QUALIFY sid < MAX(sid) OVER (PARTITION BY user_id)
    """,
)
def stream_stateful_sessions_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful sessionization executed through the REAL
    streaming engine (applyInPandasWithState, memory sink) — the §2.11
    stateful-UDF surface, driver-gated with a full value oracle: gap
    semantics, session boundaries, exact integer-cents sums, and the
    open-session-stays-in-state rule are all derivable in SQL via the
    gaps-and-islands construction, so a wrong state hand-off or a
    double emission mismatches the hash."""
    from core2_spark.streaming.events import _event_stream, run_stream_to_memory
    from core2_spark.streaming.stateful import sessionize_stateful

    stream = _event_stream(spark, sf_dir).select("user_id", "ts", "value")
    sink = run_stream_to_memory(
        sessionize_stateful(stream, gap_minutes=10), mode="update"
    )
    return spark.table(sink)


@query(
    "stream_cdc_log_tail",
    oracle="""
    SELECT 'put' AS _change, COUNT(*) AS n_changes,
           TIMESTAMP '2024-03-01 00:00:00' AS max_log_position
    FROM nation
    UNION ALL
    SELECT 'delete', COUNT(*), TIMESTAMP '2024-04-01 00:00:00'
    FROM nation WHERE n_nationkey < 5
    """,
)
def stream_cdc_log_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tail an engine version table as a structured stream
    (streaming/cdc.py — the streaming twin of Snapshot.changes):
    ingest nation rows in one transaction plus a deterministic delete
    in a second, drain the CDC stream availableNow, and summarize the
    change records per (_change) tag with the max log position.

    Full value oracle (was rows-only until round 9): with fixed tx
    times and a deterministic delete predicate (id < 5), the change
    summary is exactly derivable in SQL — every put is one change
    record stamped with the first tx's time, every tombstone one
    record stamped with the second's, and the stream's drained state
    must equal that, proving the streaming execution path end-to-end
    (file-source discovery, schema inference, tag derivation,
    complete-mode state)."""
    import os
    import shutil
    import tempfile
    import uuid

    from core2_spark.catalog import load_table
    from core2_spark.engine import Delete, Engine, Put
    from core2_spark.streaming.cdc import changes_stream
    from core2_spark.streaming.events import run_stream_to_memory

    root = os.path.join(
        tempfile.gettempdir(), "core2_spark_cdc_q", uuid.uuid4().hex[:8]
    )
    shutil.rmtree(root, ignore_errors=True)
    eng = Engine(spark, root)
    nation = load_table(spark, sf_dir, "nation").withColumnRenamed(
        "n_nationkey", "id"
    )
    eng.submit_tx([Put("nation", nation)], tx_time="2024-03-01T00:00:00")
    eng.submit_tx(
        # deterministic predicate (NOT an unordered limit) so the
        # oracle can name the exact tombstone set
        [Delete("nation", nation.filter(F.col("id") < 5).select("id"))],
        tx_time="2024-04-01T00:00:00",
    )

    stream = changes_stream(spark, root, "nation")
    summary = stream.groupBy("_change").agg(
        F.count("*").alias("n_changes"),
        F.max(F.col("system_time_start")).alias("max_log_position"),
    )
    sink = run_stream_to_memory(summary, mode="complete")
    return spark.table(sink)
