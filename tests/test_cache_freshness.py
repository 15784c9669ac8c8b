"""X92: RFC 9111 cache-freshness lifetimes feeding the recrawl stack.

The reference never refetches (one-shot BFS, spider.go); recrawl
scheduling is engine-native. X92 adds the declared-policy rung: the
origin's own Cache-Control/Expires/Last-Modified headers."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from ptt_spider_go_spark.operators.recrawl import (
    cache_freshness,
    cache_recrawl_due,
)

FETCHED = "2026-08-15 10:00:00"


def _log(spark, rows):
    """rows: (url, cache_control, expires, date_hdr, last_modified)"""
    df = spark.createDataFrame(
        rows,
        "url string, cache_control string, expires string, "
        "date_hdr string, last_modified string",
    )
    return df.select(
        "url",
        F.expr(f"timestamp'{FETCHED}'").alias("fetched_at"),
        "cache_control", "expires", "date_hdr", "last_modified",
    )


def _fresh(spark, rows):
    out = cache_freshness(_log(spark, rows)).collect()
    return {r["url"]: (r["lifetime_s"], r["source"]) for r in out}


def test_directive_matrix(spark):
    got = _fresh(spark, [
        ("u0", "max-age=3600", None, None, None),
        ("u1", 'private, max-age="600", stale-while-revalidate=30',
         None, None, None),
        ("u2", "s-maxage=300, max-age=3600", None, None, None),
        ("u3", "no-store", None, None, None),
        ("u4", "public, no-cache", None, None, None),
        ("u5", None, "Sat, 15 Aug 2026 12:00:00 GMT",
         "Sat, 15 Aug 2026 10:00:00 GMT", None),
        ("u6", None, "0", None, None),
        ("u7", None, None, None, None),
    ])
    assert got["u0"] == (3600, "max-age")
    assert got["u1"] == (600, "max-age")
    assert got["u2"] == (300, "s-maxage")  # shared cache outranks
    assert got["u3"] == (0, "no-store")
    assert got["u4"] == (0, "no-store")
    assert got["u5"] == (7200, "expires")
    assert got["u6"] == (0, "expires")  # unparseable Expires = expired
    assert got["u7"] == (None, None)


def test_token_boundaries_not_substrings(spark):
    got = _fresh(spark, [
        # neither directive present as a token -> falls through to NULL
        ("u0", "xmax-age=5", None, None, None),
        ("u1", "no-storefront", None, None, None),
        # comma boundary without space still matches
        ("u2", "public,max-age=45", None, None, None),
    ])
    assert got["u0"] == (None, None)
    assert got["u1"] == (None, None)
    assert got["u2"] == (45, "max-age")


def test_expires_before_date_clamps_to_zero(spark):
    got = _fresh(spark, [
        ("u0", None, "Sat, 15 Aug 2026 08:00:00 GMT",
         "Sat, 15 Aug 2026 10:00:00 GMT", None),
    ])
    assert got["u0"] == (0, "expires")


def test_expires_without_date_uses_fetched_at(spark):
    got = _fresh(spark, [
        ("u0", None, "Sat, 15 Aug 2026 10:30:00 GMT", None, None),
    ])
    assert got["u0"] == (1800, "expires")


def test_heuristic_tenth_of_age_and_cap(spark):
    got = _fresh(spark, [
        # modified 10h before fetch -> 1h fresh
        ("u0", None, None, None, "Fri, 15 Aug 2026 00:00:00 GMT"),
        # modified ~41 days before -> crosses the 24h cap
        ("u1", None, None, None, "Sat, 05 Jul 2026 10:00:00 GMT"),
        # Last-Modified in the FUTURE of the reference -> no heuristic
        ("u2", None, None, None, "Sun, 16 Aug 2026 10:00:00 GMT"),
        # unparseable Last-Modified -> no heuristic
        ("u3", None, None, None, "yesterday-ish"),
    ])
    assert got["u0"] == (3600, "heuristic")
    assert got["u1"] == (86400, "heuristic")
    assert got["u2"] == (None, None)
    assert got["u3"] == (None, None)


def test_next_fetch_at_is_fetched_plus_lifetime(spark):
    out = cache_freshness(
        _log(spark, [("u0", "max-age=3600", None, None, None)])
    ).collect()[0]
    assert out["next_fetch_at"] == dt.datetime(2026, 8, 15, 11, 0, 0)


def test_cache_recrawl_due_declared_beats_kind_ttl(spark):
    rows = [
        # max-age 60s, fetched 2min ago -> due NOW despite week TTL
        ("fast", "max-age=60", None, None, None),
        # max-age 30 days -> NOT due despite the 1h kind TTL
        ("slow", "max-age=2592000", None, None, None),
        # no policy -> falls back to kind TTL (1h) -> due
        ("fallback", None, None, None, None),
    ]
    log = _log(spark, rows).withColumn("kind_rank", F.lit(0))
    now = "2026-08-15 10:02:00"
    due = cache_recrawl_due(log, now, ttls_s={0: 3600})
    got = {r["url"]: r for r in due.collect()}
    assert "fast" in got and "slow" not in got
    assert got["fast"]["age_s"] == 120
    assert got["fast"]["overdue_periods"] == 2
    # fallback: age 120s < 3600s kind TTL -> not due either
    assert "fallback" not in got
    later = cache_recrawl_due(log, "2026-08-15 12:00:00", ttls_s={0: 3600})
    urls = {r["url"] for r in later.collect()}
    assert urls == {"fast", "fallback"}  # slow still fresh for 30 days
