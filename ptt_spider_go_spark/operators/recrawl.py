"""Freshness-driven recrawl scheduling over the fetch log.

A BFS crawl (the reference's mode, spider.go) visits each URL once; a
production crawler then RE-visits by content-change expectation: index
pages (which gain new links) on a short TTL, article pages (immutable
once posted) on a long one. This operator turns the fetch log into the
next recrawl frontier: rows whose age has passed their kind's TTL, with
an integer overdue count the frontier priority can sort on (most-stale
first — the standard freshness heuristic, cf. Cho & Garcia-Molina,
"Synchronizing a database to improve freshness", 2000).

Exactness: ages are computed in integer MICROSECONDS
(unix_micros / epoch_us — the session timezone is pinned UTC so the
NTZ cast is exact), TTLs converted to micros once; due-ness and
overdue_periods are integer comparisons/divisions, so the DuckDB
oracle matches bit-for-bit. (floor(a/b) on <2^53 BIGINTs equals a//b:
the IEEE quotient is correctly rounded and integer boundaries are
representable.)

Scale shape: one narrow projection over the fetch log (url, ts, kind),
one filter — no shuffle at all; the output feeds the same frontier
union/priority machinery as fresh discoveries (plans/crawl.py), where
the regular seen-set/politeness path takes over.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: default TTLs by kind_rank: board index pages (0) refresh weekly,
#: article pages (1) monthly — articles rarely change after posting.
DEFAULT_TTLS_S = {0: 7 * 86400, 1: 30 * 86400}


def recrawl_due(fetch_log: DataFrame, now_ts: str,
                ttls_s: dict[int, int] | None = None) -> DataFrame:
    """(url, kind_rank, age_s, overdue_periods): fetch-log rows whose
    age at `now_ts` (a fixed 'YYYY-MM-DD HH:MM:SS' UTC string — the
    scheduler never reads the wall clock, so runs are replayable) has
    passed their kind's TTL. `fetch_log` needs (url, fetched_at,
    kind_rank). A kind_rank absent from `ttls_s` has NO TTL and is
    deliberately never due (its ttl_us is NULL, the >= comparison is
    NULL, the filter drops it) — recrawl is opt-in per kind, matching
    how crawlers treat one-shot resources (robots files, media
    bytes)."""
    ttls_s = ttls_s or DEFAULT_TTLS_S
    t_us = F.unix_micros(F.col("fetched_at").cast("timestamp"))
    now_us = F.unix_micros(F.lit(now_ts).cast("timestamp"))
    ttl_us = None
    for k, v in sorted(ttls_s.items()):
        cond = F.when(F.col("kind_rank") == k, F.lit(v * 1_000_000))
        ttl_us = cond if ttl_us is None else ttl_us.when(
            F.col("kind_rank") == k, F.lit(v * 1_000_000)
        )
    age_us = (now_us - t_us).alias("age_us")
    x = fetch_log.select(
        "url", "kind_rank", age_us, ttl_us.cast("long").alias("ttl_us")
    )
    return (
        x.filter(F.col("age_us") >= F.col("ttl_us"))
        .select(
            "url", "kind_rank",
            F.floor(F.col("age_us") / F.lit(1_000_000))
            .cast("long").alias("age_s"),
            F.floor(F.col("age_us") / F.col("ttl_us"))
            .cast("long").alias("overdue_periods"),
        )
    )
