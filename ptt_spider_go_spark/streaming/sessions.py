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
from decimal import ROUND_HALF_UP, Decimal
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUT_SCHEMA = (
    "user_id long, session_start timestamp, n_events long, total_value double"
)
_STATE_SCHEMA = "start long, last long, n long, total double"

_MILLI = Decimal("0.001")


def _quantize_milli(v: float) -> int:
    """value -> integer milli-units, matching the batch twin's
    cast(value AS DECIMAL(18,3)) (HALF_UP on the shortest decimal repr,
    which is what both Spark and DuckDB produce on this data). Summing
    exact integers makes total_value independent of fold order AND
    bit-identical to the decimal-summing batch/oracle SQL."""
    return int(Decimal(repr(float(v))).quantize(_MILLI, ROUND_HALF_UP) * 1000)


def _close_and_start(rows_ts_us, rows_milli, state_tuple, gap_us):
    """Fold sorted (ts_us, milli_value) events into
    (closed_sessions, state); totals accumulate as exact milli ints."""
    closed = []
    start, last, n, total = state_tuple
    for ts, m in zip(rows_ts_us, rows_milli):
        if start is None:
            start, last, n, total = ts, ts, 1, m
        elif ts - last > gap_us:
            closed.append((start, n, total))
            start, last, n, total = ts, ts, 1, m
        else:
            last, n, total = ts, n + 1, total + m
    return closed, (start, last, n, total)


def sessionize_stream(events: DataFrame, gap_minutes: int = 30,
                      watermark: str = "1 hour") -> DataFrame:
    """Streaming DataFrame of CLOSED sessions. Sessions close via the
    gap path (a later event arrives > gap after the last) or via
    event-time timeout once the watermark passes last_event + gap.

    total_value parity with the batch twin is exact, not approximate:
    each value is quantized to decimal(18,3) milli-units before
    accumulation (_quantize_milli), so the session total equals the
    batch twin's decimal sum bit-for-bit regardless of fold order.
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
                 "n_events": [n], "total_value": [int(total) / 1000.0]})
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        ts_us = rows["ts"].astype("int64") // 1000  # ns -> us
        milli = [_quantize_milli(v) for v in rows["value"]]
        if state.exists:
            s0, l0, n0, t0 = state.get
            st = (s0, l0, n0, int(t0))
        else:
            st = (None, None, 0, 0)
        closed, st = _close_and_start(ts_us.tolist(), milli, st, gap_us)
        state.update((st[0], st[1], st[2], float(st[3])))
        # Event-time timeout: close the open session once the watermark
        # passes its last event + gap.
        state.setTimeoutTimestamp(st[1] // 1000 + gap_us // 1000)
        if closed:
            yield pd.DataFrame(
                {"user_id": [user_id] * len(closed),
                 "session_start": [pd.Timestamp(c[0], unit="us") for c in closed],
                 "n_events": [c[1] for c in closed],
                 "total_value": [c[2] / 1000.0 for c in closed]})

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
    source and return the CLOSED sessions as a batch DataFrame.

    Sessions still open when the bounded run ends are DROPPED:
    availableNow terminates before their event-time timeouts can fire,
    and no terminal state flush exists. Callers that need every session
    emitted must sentinel-terminate the input — append one far-future
    event per user, which closes every real session through the normal
    gap path (the sentinel's own session is the one dropped). That is
    exactly what the contract query and the parity tests do, which is
    why the operator carries a full DuckDB oracle despite this caveat.
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
