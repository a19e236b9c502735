"""Kafka-shaped log transport (SURVEY.md §2.1 log source; upstream
core2 ships a `modules/kafka` log implementation).

core2's transaction log is pluggable — in-process, file, or Kafka —
and every consumer sees the same totally-ordered record stream.  The
Spark analogue: a readStream that always presents KAFKA'S WIRE SCHEMA
(key/value binary, topic, partition, offset, timestamp), whatever the
physical transport:

- ``transport="kafka"``: the real `readStream.format("kafka")` source
  (requires the spark-sql-kafka connector and a broker — neither is in
  this container, so this path raises with a clear message here and
  works unchanged on a cluster with the package installed);
- ``transport="file"``: in-container twin — a file-source stream over
  the events fixture re-shaped to the wire schema (value = JSON bytes,
  offset = the event id, partition = hash(key) % n);
- ``transport="auto"``: try kafka, fall back to file.

Downstream code is transport-agnostic: it sees wire records and
decodes them with ``parse_log_records`` exactly as a Kafka consumer
would (`CAST(value AS STRING)` → `from_json`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Kafka's fixed source schema (spark-sql-kafka's output columns).
WIRE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType(), True),
        T.StructField("value", T.BinaryType(), True),
        T.StructField("topic", T.StringType(), True),
        T.StructField("partition", T.IntegerType(), True),
        T.StructField("offset", T.LongType(), True),
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("timestampType", T.IntegerType(), True),
    ]
)

# The event payload carried in `value` by the file twin.
EVENT_VALUE_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def kafka_log_stream(
    spark: SparkSession,
    topic: str,
    bootstrap_servers: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """The real Kafka source.  At scale: one Spark partition per Kafka
    partition, offsets checkpointed by the sink — the log position IS
    the basis, exactly the reference's model."""
    try:
        return (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topic)
            .option("startingOffsets", starting_offsets)
            .load()
        )
    except Exception as exc:  # connector jar absent in this container
        raise RuntimeError(
            "Kafka source unavailable (spark-sql-kafka connector not on the "
            "classpath). On a cluster, submit with --packages "
            "org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>; "
            "in this container use read_log_stream(transport='file') for "
            "the wire-schema-identical file twin."
        ) from exc


def file_log_stream(
    spark: SparkSession,
    sf_dir: str,
    topic: str = "core2-log",
    n_partitions: int = 4,
) -> DataFrame:
    """File-transport twin: the events fixture streamed as Kafka wire
    records.  key = user_id bytes (Kafka's per-key ordering unit),
    value = the event row as JSON bytes, offset = event_id (the
    fixture's monotonic id — a real file log would use the append
    position).  The partitioner is key % n (a standard pluggable
    Kafka partitioner for numeric keys) rather than Murmur2-on-bytes:
    per-key ordering — the only property consumers may rely on — is
    identical, and a cross-engine-deterministic assignment lets the
    downstream consumer-group view carry a full DuckDB value oracle
    instead of a rows-only check."""
    from core2_spark.streaming.events import _event_stream

    ev = _event_stream(spark, sf_dir)
    return ev.select(
        F.encode(F.col("user_id").cast("string"), "utf-8").alias("key"),
        F.encode(F.to_json(F.struct(*ev.columns)), "utf-8").alias("value"),
        F.lit(topic).alias("topic"),
        F.pmod(F.col("user_id"), F.lit(n_partitions))
        .cast("int")
        .alias("partition"),
        F.col("event_id").cast("long").alias("offset"),
        F.col("ts").alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )


def read_log_stream(
    spark: SparkSession,
    transport: str = "auto",
    *,
    topic: str = "core2-log",
    bootstrap_servers: str | None = None,
    sf_dir: str | None = None,
) -> DataFrame:
    """Transport-selecting entry point (see module docstring)."""
    if transport == "kafka":
        return kafka_log_stream(spark, topic, bootstrap_servers or "localhost:9092")
    if transport == "file":
        if sf_dir is None:
            raise ValueError("file transport needs sf_dir")
        return file_log_stream(spark, sf_dir, topic)
    if transport == "auto":
        try:
            return kafka_log_stream(
                spark, topic, bootstrap_servers or "localhost:9092"
            )
        except RuntimeError:
            if sf_dir is None:
                raise
            return file_log_stream(spark, sf_dir, topic)
    raise ValueError(f"unknown transport {transport!r}")


def parse_log_records(wire: DataFrame, value_schema: str = EVENT_VALUE_SCHEMA) -> DataFrame:
    """Decode wire records the way a Kafka consumer does: value bytes →
    string → from_json, keeping the transport columns that carry the
    log position (topic, partition, offset)."""
    return wire.select(
        "topic",
        "partition",
        "offset",
        "timestamp",
        F.from_json(F.col("value").cast("string"), value_schema).alias("rec"),
    ).select("topic", "partition", "offset", "timestamp", "rec.*")
