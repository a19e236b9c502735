"""Continuous ingest: stream → bitemporal Engine (SURVEY.md §3.3 +
§2.10 — the reference's log-consumer/indexer loop on Spark).

core2's indexer tails the transaction log and applies each record as a
transaction [upstream: core2 `indexer.clj`, `log.clj`]; queries then
run at any basis the log has reached.  The Structured Streaming
analogue is ``foreachBatch``: each micro-batch commits as ONE engine
transaction, so

- the micro-batch id maps 1:1 to a transaction (deterministic replay:
  Spark re-delivers a failed batch with the same id, and committing a
  batch id at-most-once gives exactly-once table state);
- every committed batch advances the engine clock — time-travel
  queries see batch boundaries as system-time versions;
- all of the engine's visibility rules (tombstones, retroactive
  app-time, repeatable bases) apply to streamed data unchanged.

At scale this is the cluster pattern verbatim: checkpointed source
offsets + idempotent per-batch commit; swap the file/Kafka source, not
the sink logic.
"""

from __future__ import annotations

from datetime import timedelta

from pyspark.sql import DataFrame


def stream_into_engine(
    stream: DataFrame,
    engine,
    table: str,
    epoch: str = "2024-06-01",
):
    """Start a streaming query committing each micro-batch as one
    engine transaction.  Returns the StreamingQuery; callers drive it
    (`processAllAvailable()` for bounded replays, `awaitTermination()`
    in production).

    Batch tx_time = epoch + batch_id seconds: deterministic, strictly
    increasing, and replay-stable — a redelivered batch id is refused
    by the engine's total-order check instead of double-applying.
    """
    from datetime import datetime

    from core2_spark.engine import Put

    base = datetime.fromisoformat(epoch)
    committed: set[int] = set()

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in committed:  # redelivery after a sink failure
            return
        if batch_df.isEmpty():
            return
        engine.submit_tx(
            [Put(table, batch_df)],
            tx_time=base + timedelta(seconds=int(batch_id) + 1),
        )
        committed.add(batch_id)

    return stream.writeStream.foreachBatch(commit_batch).start()


def stream_upsert_into_engine(
    stream: DataFrame,
    engine,
    table: str,
    epoch: str = "2024-06-01",
    delete_col: str | None = None,
):
    """CDC-apply: commit each micro-batch as one MERGE-shaped engine
    transaction — rows whose id exists in the target become new
    versions (UPDATE), unseen ids append (INSERT), and rows flagged in
    ``delete_col`` (when given) become tombstones (DELETE).  This is
    the streaming twin of the SQL MERGE INTO statement: a change feed
    from an OLTP system replays into the bitemporal table with every
    batch atomic, clock-ordered, and redelivery-safe.

    Duplicate ids WITHIN one batch are collapsed to the batch's last
    occurrence by ``_seq`` when present, else refused — the engine's
    within-tx row_seq would otherwise pick an arbitrary survivor under
    distributed ordering, and silent nondeterminism is the one thing a
    CDC apply must never do.

    Scale: the upsert needs no read of the target at all — the
    engine's version semantics make Put-on-existing-id an update BY
    CONSTRUCTION (latest version wins), so each batch is one append +
    one optional tombstone write; no join against a 100 TB table on
    the hot path."""
    from datetime import datetime

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from core2_spark.engine import Delete, Put

    base = datetime.fromisoformat(epoch)
    committed: set[int] = set()

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in committed:
            return
        if batch_df.isEmpty():
            return
        df = batch_df
        if "_seq" in df.columns:
            w = Window.partitionBy("id").orderBy(F.col("_seq").desc())
            df = (
                df.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn", "_seq")
            )
        else:
            dup = df.groupBy("id").count().filter(F.col("count") > 1).take(1)
            if dup:
                raise ValueError(
                    f"stream_upsert batch {batch_id}: duplicate id "
                    f"{dup[0][0]!r} within one batch and no _seq column "
                    "to order them — refusing a nondeterministic apply"
                )
        ops = []
        if delete_col is not None:
            # NULL flags mean "not a delete" (common CDC shape: the
            # feed only sets the flag on deletes) — under 3VL a bare
            # filter(col)/filter(~col) pair would drop NULL-flagged
            # rows from BOTH branches, silently losing the upsert
            flag = F.coalesce(F.col(delete_col), F.lit(False))
            dels = df.filter(flag).select("id")
            ups = df.filter(~flag).drop(delete_col)
            dels = dels.localCheckpoint(eager=True)
            ups = ups.localCheckpoint(eager=True)
            if not ups.isEmpty():
                ops.append(Put(table, ups))
            if not dels.isEmpty():
                ops.append(Delete(table, dels, "id"))
        else:
            ops.append(Put(table, df))
        if ops:
            engine.submit_tx(
                ops, tx_time=base + timedelta(seconds=int(batch_id) + 1)
            )
        committed.add(batch_id)

    return stream.writeStream.foreachBatch(commit_batch).start()
