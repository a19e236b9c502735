"""Streaming CDC: tail an engine version table as a structured stream
(SURVEY.md §3.3 — the reference's consumers tail the tx log from an
offset; upstream core2's log is its integration surface).

``Snapshot.changes`` is the batch view of the change feed; this is its
streaming twin: every file a transaction commits under the table
directory becomes a micro-batch of change records (``_change`` =
put/delete, ordered per id by ``system_time_start, _tx_seq``).  The
file-source offsets are checkpointed by the sink, so the stream
position IS the log position — resuming a consumer replays exactly the
unseen suffix, the same contract as a Kafka-offset tail.

Scale posture: the source lists only NEW files per trigger (no
re-scan of consumed history), and the day-partitioned layout keeps
per-day directories bounded; a `since` lower bound prunes old
partitions at the first load.
"""

from __future__ import annotations

import os
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from core2_spark import temporal as bt


def changes_stream(
    spark: SparkSession,
    engine_root: str,
    table: str,
    since: str | datetime | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """readStream over ``<engine_root>/<table>``: change records with
    a ``_change`` column ('put'/'delete') plus the ordering columns
    (``system_time_start``, ``_tx_seq``) consumers need to apply
    changes in log order.  ``since`` drops rows at or before that
    system time (and prunes whole day partitions)."""
    path = os.path.join(engine_root, table)
    # batch-infer the schema once (file streams require an explicit
    # schema); includes the _sys_day partition column via discovery
    schema = spark.read.option("mergeSchema", "true").parquet(path).schema
    reader = spark.readStream.schema(schema).option("basePath", path)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    # the /* glob makes NEW day-partition directories visible to the
    # file source as they appear
    raw = reader.parquet(path + "/*")

    if since is not None:
        s = bt._ts(since)
        pred = F.col(bt.SYS_START) > s
        if bt.SYS_DAY in schema.fieldNames():
            pred = pred & (F.col(bt.SYS_DAY) >= F.to_date(s))
        raw = raw.filter(pred)

    tomb = (
        F.coalesce(F.col(bt.TOMBSTONE), F.lit(False))
        if bt.TOMBSTONE in schema.fieldNames()
        else F.lit(False)
    )
    out = raw.withColumn(
        "_change", F.when(tomb, F.lit("delete")).otherwise(F.lit("put"))
    )
    drop = [c for c in (bt.TOMBSTONE, bt.SYS_DAY) if c in schema.fieldNames()]
    return out.drop(*drop)


def replicate_stream(
    spark: SparkSession,
    src_root: str,
    table: str,
    dst_engine,
    checkpoint: str,
    since: str | datetime | None = None,
    available_now: bool = True,
):
    """Continuous replication: tail the source engine's change feed as
    a stream and apply each micro-batch into a replica engine
    (``Engine.apply_changes``) — §3.3's follower node as a
    foreachBatch loop.  Version rows replicate VERBATIM (original
    system/app-time rectangles, within-tx sequence), so the replica
    converges to the source's exact bitemporal state; the stream's
    checkpointed file offsets make delivery exactly-once across
    restarts — the same contract as ``streaming.ingest`` but in the
    opposite direction.  ``available_now=True`` drains the current
    backlog and stops (the testing/batch-catch-up mode); False runs
    until stopped."""

    def apply_batch(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        dst_engine.apply_changes(table, batch_df)

    stream = changes_stream(spark, src_root, table, since=since)
    writer = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def maintain_views_stream(
    spark: SparkSession,
    engine,
    table: str,
    checkpoint: str,
    available_now: bool = True,
):
    """CONTINUOUS incremental view maintenance: tail ``table``'s
    change feed as a stream and refresh every materialized view over
    it after each micro-batch — mviews.py's refresh loop driven by the
    log instead of manual calls (the streaming twin of
    ``Engine(auto_refresh_views=True)``, for maintainers running in a
    separate process from the writer).

    The micro-batch content is ignored on purpose: it is the TRIGGER
    (new files = new transactions), while the refresh itself re-reads
    the delta from the view's own clock — so a lost/duplicated trigger
    can never lose or double-apply changes (refresh is idempotent:
    noop when the view is already at the head), and the checkpoint
    only bounds trigger redelivery, not correctness."""
    from core2_spark import mviews

    def refresh_views(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        engine.refresh()  # follow the writer's log head
        for name, meta in mviews.list_views(engine).items():
            if meta.get("table") == table:
                mviews.refresh(engine, name)

    stream = changes_stream(spark, os.path.join(engine.root), table)
    writer = (
        stream.writeStream.foreachBatch(refresh_views)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
