"""Structured Streaming wrappers (SURVEY.md §2.10 Spark-native
extension).

core2's ingest is a totally-ordered tx log consumed by an indexer
[upstream: core2 `log.clj`, `indexer.clj`]; its queries are batch at a
basis.  The Spark-native analogue of continuous ingest is Structured
Streaming: readStream over the append-only table directory, event-time
watermarks for late data, windowed/stateful aggregation, and
dropDuplicatesWithinWatermark as the streaming form of the bitemporal
latest-version dedup.

For deterministic local verification the streaming queries run with a
memory sink and ``processAllAvailable()`` — one pass over the fixture
parquet acts as the bounded stream.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from core2_spark.catalog import table_path


def _event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table.

    The fixture is a single parquet *file* while the stream source
    needs a *directory*, so a session-temp dir with a symlink stands in
    — at scale the table is a directory of appended files anyway.
    A ns-precision ts arrives as int64 (see catalog._load_events) and
    is floored to a microsecond timestamp here too; a µs fixture
    streams through unchanged.
    """
    import os
    import tempfile

    from core2_spark.catalog import ensure_nanos_conf, normalize_event_ts

    ensure_nanos_conf(spark)
    schema = spark.read.parquet(table_path(sf_dir, "events")).schema
    # the symlink target must be ABSOLUTE: a relative sf_dir (e.g.
    # `_data/sf1`) would otherwise resolve against the symlink's /tmp
    # directory and dangle — the stream then silently reads ZERO files
    # (found by the r9 sf1 parity sweep).  The stream dir is keyed by
    # the absolute path too, so relative and absolute spellings of one
    # fixture share a dir, and a stale/dangling link is replaced.
    target = os.path.abspath(table_path(sf_dir, "events"))
    stream_dir = os.path.join(
        tempfile.gettempdir(),
        "core2_spark_stream",
        target.strip("/").replace("/", "_"),
    )
    os.makedirs(stream_dir, exist_ok=True)
    link = os.path.join(stream_dir, "events.parquet")
    if os.path.lexists(link) and os.path.realpath(link) != os.path.realpath(
        target
    ):
        os.remove(link)
    if not os.path.lexists(link):
        os.symlink(target, link)
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    # one shared normalization with the batch loader — unexpected
    # encodings fail fast instead of dying later as watermark errors
    return normalize_event_ts(raw, schema["ts"].dataType)


def tumbling_agg(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Tumbling 1-hour count/sum with an event-time watermark bounding
    state — the streaming twin of `stream_tumbling_window`.  The sum
    uses the exact-decimal dsum discipline (queries/util.py) so the
    streamed result is bit-identical to the batch twin AND to the
    DuckDB oracle — which upgrades `stream_structured_tumbling` from a
    rows-only check to a full value-hash oracle."""
    from core2_spark.queries.util import dsum

    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "total_value"
        )
    )


def session_agg(events: DataFrame, gap: str = "10 minutes", watermark: str = "1 hour") -> DataFrame:
    """Streaming session windows (gap-based), append mode: a session
    emits once the watermark passes its end — the streaming twin of
    `stream_session_window`.  Bounded replays leave the trailing
    watermark-horizon sessions unflushed by design (they might still
    grow); tests compare the emitted prefix against the batch answer."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming dedup on event_id within the watermark horizon — the
    streaming analogue of latest-version visibility."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_stream_to_memory(
    df: DataFrame, mode: str = "complete", name: str | None = None
) -> str:
    """Drive a streaming DataFrame to completion into a memory sink;
    returns the sink table name.  ``mode``: "complete" for
    aggregations, "append" for row-wise operators like dedup."""
    name = name or f"sink_{uuid.uuid4().hex[:8]}"
    q = (
        df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return name


def run_tumbling_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Execute the tumbling aggregation through the real streaming
    engine and return the materialized result as a batch DataFrame."""
    stream = _event_stream(spark, sf_dir)
    sink = run_stream_to_memory(tumbling_agg(stream), mode="complete")
    return spark.table(sink)
