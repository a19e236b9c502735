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
