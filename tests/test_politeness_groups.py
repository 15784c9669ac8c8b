"""X99-X101: per-IP politeness groups, robots cache expiry, frontier
drain planner.

The reference's politeness is a per-worker sleep over ONE host
(crawler/crawler.go:59-65) — grouping, refresh scheduling, and
capacity planning only exist once the frontier spans hosts; all three
operators are engine-native per the north rule. Exactness pins here,
DuckDB oracles in contract.py."""

from __future__ import annotations

import datetime as dt

from ptt_spider_go_spark.operators.politeness import (
    drain_plan,
    ip_group_budgets,
    robots_refresh_plan,
)


def _budgets(spark, rows):
    return spark.createDataFrame(rows, "host string, budget long")


def test_ip_group_budgets_min_envelope_and_exact_split(spark):
    budgets = _budgets(spark, [("a", 10), ("b", 30), ("c", 20), ("d", 7)])
    dns = spark.createDataFrame(
        [("a", "ip1"), ("b", "ip1"), ("c", "ip1")], "host string, ip string")
    out = {r["host"]: r for r in ip_group_budgets(budgets, dns).collect()}
    # group envelope = min(10, 30, 20) = 10, split 10 * w/60:
    # a: 100/60=1 rem 40; b: 300/60=5 rem 0; c: 200/60=3 rem 20
    # leftover = 10-9 = 1 -> largest remainder (a)
    assert (out["a"]["ip_budget"], out["a"]["budget"]) == (10, 2)
    assert out["b"]["budget"] == 5
    assert out["c"]["budget"] == 3
    assert sum(out[h]["budget"] for h in "abc") == 10  # exact group sum
    # unresolved host: singleton group, budget unchanged
    assert out["d"]["ip"] == "unresolved:d"
    assert (out["d"]["ip_budget"], out["d"]["budget"]) == (7, 7)


def test_ip_group_budgets_remainder_tie_breaks_by_host(spark):
    # equal weights, envelope not divisible: 5 over 3 equal hosts ->
    # base 1 each (5*5//15), remainders all equal (10), leftover 2
    # goes to the host-asc first two
    budgets = _budgets(spark, [("x", 5), ("y", 5), ("z", 5)])
    dns = spark.createDataFrame(
        [(h, "ip9") for h in "xyz"], "host string, ip string")
    out = {r["host"]: r["budget"] for r in
           ip_group_budgets(budgets, dns).collect()}
    assert out == {"x": 2, "y": 2, "z": 1}


def test_ip_group_budgets_zero_weight_group(spark):
    budgets = _budgets(spark, [("a", 0), ("b", 0)])
    dns = spark.createDataFrame(
        [("a", "ip1"), ("b", "ip1")], "host string, ip string")
    out = {r["host"]: r["budget"] for r in
           ip_group_budgets(budgets, dns).collect()}
    assert out == {"a": 0, "b": 0}


def test_robots_refresh_plan_expiry_equals_cache_miss(spark):
    frontier = spark.createDataFrame(
        [("https://fresh.example/1", 4), ("https://stale.example/2", 6),
         ("https://unknown.example/3", 5)], "url string, priority long")
    now = int(dt.datetime(2026, 8, 19, tzinfo=dt.timezone.utc).timestamp())
    cache = spark.createDataFrame(
        [("fresh.example", dt.datetime(2026, 8, 18, 23, 0)),
         ("stale.example", dt.datetime(2026, 8, 1))],
        "host string, fetched_at timestamp")
    plan = robots_refresh_plan(frontier, cache, now, ttl_s=86_400).collect()
    acts = {(r["host"], r["action"]) for r in plan}
    assert ("fresh.example", "fetch") in acts
    assert ("stale.example", "defer") in acts           # expired = unknown
    assert ("stale.example", "robots_fetch") in acts
    assert ("unknown.example", "robots_fetch") in acts
    assert len(plan) == 3 + 2                            # defer-not-drop


def test_drain_plan_ceil_starved_critical(spark):
    frontier = spark.createDataFrame(
        [(f"https://a.example/{i}",) for i in range(10)]
        + [(f"https://b.example/{i}",) for i in range(9)]
        + [("https://c.example/1",)], ["url"])
    budgets = _budgets(spark, [("a.example", 3), ("b.example", 9)])
    out = {r["host"]: r for r in drain_plan(frontier, budgets).collect()}
    assert out["a.example"]["supersteps"] == 4           # ceil(10/3)
    assert out["b.example"]["supersteps"] == 1           # exact divide
    assert out["a.example"]["is_critical"]
    assert not out["b.example"]["is_critical"]
    assert out["c.example"]["is_starved"]
    assert out["c.example"]["supersteps"] is None
    assert not out["c.example"]["is_critical"]
