"""Structured Streaming surface (bounded, deterministic via availableNow)."""

from ptt_spider_go_spark.streaming.dedup import (
    dedup_stream,
    near_dup_stream,
    read_documents_stream,
    run_dedup_bounded,
    run_near_dup_bounded,
)
from ptt_spider_go_spark.streaming.sessions import (
    run_sessionize_bounded,
    sessionize_stream,
)
from ptt_spider_go_spark.streaming.windows import (
    read_events_stream,
    run_bounded,
    windowed_event_counts,
)

__all__ = [
    "dedup_stream",
    "near_dup_stream",
    "run_near_dup_bounded",
    "read_documents_stream",
    "read_events_stream",
    "run_bounded",
    "run_dedup_bounded",
    "run_sessionize_bounded",
    "sessionize_stream",
    "windowed_event_counts",
]
