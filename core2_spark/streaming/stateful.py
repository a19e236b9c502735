"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.10/§2.11 — Spark-native extension surface).

core2 has no stateful stream operators (its continuity is the tx log);
this is the engine's escape hatch for operators Spark's built-ins
can't express: arbitrary per-key state evolved batch-by-batch with
Arrow-batched pandas, bounded by event-time timeouts.

Example operator: per-user running profile (event count, total value,
last seen) emitted on every update — the streaming analogue of a
continuously-maintained aggregate table.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, last_ts timestamp"
STATE_SCHEMA = "n long, total double"


def running_user_profile(events: DataFrame) -> DataFrame:
    """Continuously-updated per-user profile over the event stream.

    The state function is nested so cloudpickle ships it by value —
    executors never need `core2_spark` on their sys.path.
    """

    def update_profile(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        n, total = state.get if state.exists else (0, 0.0)
        last_ts = None
        for pdf in batches:
            n += len(pdf)
            total += float(pdf["value"].sum())
            batch_max = pdf["ts"].max()
            last_ts = batch_max if last_ts is None else max(last_ts, batch_max)
        state.update((n, total))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [round(total, 4)],
                "last_ts": [last_ts],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
