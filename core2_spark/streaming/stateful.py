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


SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, value_cents long"
)
SESSION_STATE_SCHEMA = "start timestamp, last timestamp, n long, cents long"


def sessionize_stateful(events: DataFrame, gap_minutes: int = 10) -> DataFrame:
    """Per-user sessionization as a CUSTOM stateful operator: the open
    session lives in GroupState; a session CLOSES (and is emitted,
    exactly once) when a later event for the same user arrives more
    than ``gap_minutes`` after the session's last event.  Sessions
    still open at end-of-stream stay in state unflushed — true
    streaming semantics, so a bounded replay emits every session
    except each user's final one (the batch oracle excludes exactly
    those).

    This is the escape-hatch twin of ``F.session_window``: same gap
    semantics (boundary event merges — gap comparison is <=, matching
    Spark's session_window), but with the session state hand-rolled,
    which is the §2.11 surface the built-in can't represent (e.g.
    value caps or per-session early-exit rules would slot into the
    update function below).

    Scale shape: state is one fixed-width row per LIVE user key,
    partitioned by user hash across executors; each micro-batch does
    vectorized pandas gap detection per key — no per-row Python.
    Money is summed in exact integer cents (the fixture's values are
    2-decimal), so the emitted rows are bit-comparable to a SQL
    oracle with no float-tie risk.

    Within-stream ordering: gap detection sorts each batch and stitches
    against state, which is exact for a bounded single-source replay
    (one parquet file -> one micro-batch); with genuinely out-of-order
    multi-batch arrival a watermark + timeout variant would be needed
    to make closure safe.
    """

    def update_sessions(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import pandas as _pd  # by-value import: executors lack our sys.path

        gap = _pd.Timedelta(minutes=gap_minutes)
        (user_id,) = key
        if state.exists:
            s_start, s_last, s_n, s_cents = state.get
            s_start = _pd.Timestamp(s_start)
            s_last = _pd.Timestamp(s_last)
        else:
            s_start = s_last = None
            s_n = s_cents = 0
        closed: list[tuple] = []
        for pdf in batches:
            if not len(pdf):
                continue
            pdf = pdf.sort_values("ts")
            ts = pdf["ts"].dt.floor("s").reset_index(drop=True)
            cents = (
                (pdf["value"] * 100).round().astype("int64").reset_index(drop=True)
            )
            sid = (ts.diff() > gap).cumsum()
            agg = (
                _pd.DataFrame({"ts": ts, "cents": cents, "sid": sid})
                .groupby("sid")
                .agg(
                    start=("ts", "min"),
                    last=("ts", "max"),
                    n=("ts", "size"),
                    cents=("cents", "sum"),
                )
                .reset_index(drop=True)
            )
            if s_last is not None:
                if agg.at[0, "start"] - s_last <= gap:
                    # state's open session continues into this batch
                    agg.at[0, "start"] = min(agg.at[0, "start"], s_start)
                    agg.at[0, "n"] += s_n
                    agg.at[0, "cents"] += s_cents
                else:
                    closed.append(
                        (user_id, s_start, s_last + gap, int(s_n), int(s_cents))
                    )
            for row in agg.iloc[:-1].itertuples(index=False):
                closed.append(
                    (user_id, row.start, row.last + gap, int(row.n), int(row.cents))
                )
            tail = agg.iloc[-1]
            s_start, s_last = tail["start"], tail["last"]
            s_n, s_cents = int(tail["n"]), int(tail["cents"])
        if s_last is not None:
            state.update(
                (s_start.to_pydatetime(), s_last.to_pydatetime(), s_n, s_cents)
            )
        yield _pd.DataFrame(
            closed,
            columns=[
                "user_id",
                "session_start",
                "session_end",
                "n_events",
                "value_cents",
            ],
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update_sessions,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
