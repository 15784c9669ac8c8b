"""X96-X98: full RFC 3986 normalization, robots-fetch-first scheduling,
path-subtree heavy-hitter rollup.

The reference crawler builds its URLs from a template and never
normalizes discovered ones (crawler/crawler.go); these operators are
engine-native per the north rule (frontier-key quality before the
Bloom/cuckoo seen probe; RFC 9309 fetch ordering; subtree-level trap
analysis). Every Spark implementation is checked against an
INDEPENDENT pure-Python reference here (plus the DuckDB oracles in
contract.py).
"""

from __future__ import annotations

import random
import re

from pyspark.sql import functions as F

from ptt_spider_go_spark.functions.columns import (
    normalize_url_rfc3986,
    pct_normalize,
    remove_dot_segments,
)
from ptt_spider_go_spark.operators.politeness import (
    path_subtrees,
    robots_fetch_plan,
)

_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)


def ref_pct_normalize(s: str) -> str:
    """RFC 3986 §6.2.2.1-6.2.2.2, stated directly: walk the string,
    uppercase escape hex, decode unreserved escapes."""
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "%" and re.match("^[0-9A-Fa-f]{2}", s[i + 1:i + 3] or ""):
            ch = chr(int(s[i + 1:i + 3], 16))
            if ch in _UNRESERVED:
                out.append(ch)
            else:
                out.append("%" + s[i + 1:i + 3].upper())
            i += 3
        else:
            out.append(c)
            i += 1
    return "".join(out)


def ref_remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 for absolute paths, via the segment-stack
    statement of the algorithm (trailing '.'/'..' leaves '/')."""
    if not path.startswith("/"):
        return path
    stack: list[str] = []
    trailing = False
    for seg in path[1:].split("/") if len(path) > 1 else []:
        if seg == ".":
            trailing = True
        elif seg == "..":
            if stack:
                stack.pop()
            trailing = True
        else:
            stack.append(seg)
            trailing = False
    out = "/" + "/".join(stack)
    if trailing and stack:
        out += "/"
    return out


def _run_col(spark, values, col_fn, out="r"):
    df = spark.createDataFrame([(v,) for v in values], ["s"])
    rows = df.select(F.col("s"), col_fn(F.col("s")).alias(out)).collect()
    return {r["s"]: r[out] for r in rows}


# --- pct_normalize -----------------------------------------------------------

PCT_CASES = {
    "/a%2fb": "/a%2Fb",            # reserved: uppercase, never decode
    "/%7euser": "/~user",          # unreserved: decode
    "/%41%42%63": "/ABc",
    "/%2D%2e%5F%7E": "/-._~",      # the four punct unreserved chars
    "/p%g1/x": "/p%g1/x",          # malformed escape survives
    "/x%5": "/x%5",                # truncated escape survives
    "/x%": "/x%",                  # bare trailing %
    "%": "%",
    "": "",
    "a=%61&b=%2B": "a=a&b=%2B",    # query-shaped input
    "/%FF": "/%FF",                # non-ASCII escape: case fold only
    "/%ff": "/%FF",
}


def test_pct_normalize_cases(spark):
    got = _run_col(spark, list(PCT_CASES), pct_normalize)
    assert got == PCT_CASES


def test_pct_normalize_matches_reference_fuzz(spark):
    """Seeded batch vs the pure-Python reference — one Spark job for
    all examples (the one-job-many-examples fuzz pattern)."""
    rng = random.Random(20260819)
    pieces = ["%41", "%2f", "%7E", "%g1", "%5", "%", "a", "b", "/", ".",
              "~", "_", "-", "1", "4", "7", "F", "G", "g"]
    vals = sorted({
        "".join(rng.choice(pieces) for _ in range(rng.randrange(0, 9)))
        for _ in range(300)} - {""})
    got = _run_col(spark, vals, pct_normalize)
    for v in vals:
        assert got[v] == ref_pct_normalize(v), v


# --- remove_dot_segments -----------------------------------------------------

DOT_CASES = {
    "/a/./b/../c": "/a/c",
    "/a/b/..": "/a/",
    "/a/b/.": "/a/b/",
    "/..": "/",
    "/.": "/",
    "/../a": "/a",
    "/a/../..": "/",
    "/a/../../b": "/b",
    "/a/b/../../../x": "/x",
    "/a//b/../c": "/a//c",          # empty segment is a real segment
    "/a//../b": "/a/b",             # '..' pops the empty segment
    "/": "/",
    "/a/b/": "/a/b/",
    "/...": "/...",                 # three dots: a normal segment
    "/a/.../..": "/a/",
    "rel/x": "rel/x",               # non-absolute passes through
}


def test_remove_dot_segments_cases(spark):
    got = _run_col(spark, list(DOT_CASES), remove_dot_segments)
    assert got == DOT_CASES
    for k, v in DOT_CASES.items():
        assert ref_remove_dot_segments(k) == v, k


def test_remove_dot_segments_matches_reference_fuzz(spark):
    rng = random.Random(20260819)
    segs = [".", "..", "a", "b", "", "c.d", "..."]
    vals = sorted({
        "/" + "/".join(rng.choice(segs)
                       for _ in range(rng.randrange(0, 9)))
        for _ in range(300)})
    got = _run_col(spark, vals, remove_dot_segments)
    for v in vals:
        assert got[v] == ref_remove_dot_segments(v), v


# --- normalize_url_rfc3986 ---------------------------------------------------

URL_CASES = {
    "HTTP://Ex.COM:80/a/./b/../c": "http://ex.com/a/c",
    "https://h.example/%7euser/%41%42/9": "https://h.example/~user/AB/9",
    "https://h.example/a%2fb/": "https://h.example/a%2Fb/",
    "http://h.example/../a": "http://h.example/a",
    "http://h.example/a//b/../c?q=%61%2b#f": "http://h.example/a//c?q=a%2B",
    # %2E decodes to '.' FIRST (6.2.2.2), then 5.2.4 pops it:
    "http://h.example/%2e%2e/a/": "http://h.example/a/",
    "HTTPS://H.example:443": "https://h.example/",
    "http://h.example?q=%2f": "http://h.example?q=%2F",
    "mailto:a%41@x": "mailto:aA@x",  # no authority: pct-fold only
}


def test_normalize_url_rfc3986_cases(spark):
    got = _run_col(spark, list(URL_CASES), normalize_url_rfc3986)
    assert got == URL_CASES


# --- robots_fetch_plan -------------------------------------------------------

def test_robots_fetch_plan_split(spark):
    frontier = spark.createDataFrame(
        [(f"https://h{i % 4}.example/p/{i}", i) for i in range(20)],
        ["url", "priority"],
    )
    known = spark.createDataFrame([("h0.example",), ("h2.example",)],
                                  ["host"])
    plan = robots_fetch_plan(frontier, known).collect()
    by_action: dict[str, list] = {}
    for r in plan:
        by_action.setdefault(r["action"], []).append(r)
    # defer-not-drop: every frontier row survives + 2 robots tasks
    assert len(plan) == 20 + 2
    assert len(by_action["fetch"]) == 10
    assert len(by_action["defer"]) == 10
    assert all(r["host"] in ("h0.example", "h2.example")
               for r in by_action["fetch"])
    robots = sorted(by_action["robots_fetch"], key=lambda r: r["host"])
    assert [r["url"] for r in robots] == [
        "https://h1.example/robots.txt", "https://h3.example/robots.txt"]
    # robots task carries the host's BEST (min) frontier priority
    assert robots[0]["priority"] == 1 and robots[1]["priority"] == 3


def test_robots_fetch_plan_all_known_emits_no_robots_rows(spark):
    frontier = spark.createDataFrame(
        [("https://h0.example/a", 5)], ["url", "priority"])
    known = spark.createDataFrame([("h0.example",)], ["host"])
    plan = robots_fetch_plan(frontier, known).collect()
    assert [(r["action"], r["url"]) for r in plan] == [
        ("fetch", "https://h0.example/a")]


# --- path_subtrees -----------------------------------------------------------

def test_path_subtrees_rollup(spark):
    rows = (
        [(f"https://a.example/x/y/{i}",) for i in range(6)]
        + [(f"https://a.example/z/{i}",) for i in range(3)]
        + [("https://a.example/",)]          # root: counts, no prefix
        + [("https://b.example/x",)]
    )
    frontier = spark.createDataFrame(rows, ["url"])
    out = {(r["host"], r["prefix"], r["depth"]): r
           for r in path_subtrees(frontier, max_depth=2, min_urls=5,
                                  min_share=0.5).collect()}
    a_x = out[("a.example", "/x", 1)]
    # host_urls includes the root-only row (10, not 9)
    assert a_x["host_urls"] == 10 and a_x["n_urls"] == 6
    assert a_x["share"] == 0.6 and a_x["is_heavy"]
    assert out[("a.example", "/x/y", 2)]["n_urls"] == 6
    assert out[("a.example", "/x/y", 2)]["is_heavy"]
    assert not out[("a.example", "/z", 1)]["is_heavy"]    # 3 < min_urls
    assert not out[("b.example", "/x", 1)]["is_heavy"]    # 1 < min_urls
    # depth capped at max_depth: no depth-3 rows despite 3-level paths
    assert all(k[2] <= 2 for k in out)


def test_path_subtrees_share_is_per_host(spark):
    frontier = spark.createDataFrame(
        [("https://a.example/p/1",), ("https://b.example/p/1",),
         ("https://b.example/q/1",)], ["url"])
    out = {(r["host"], r["prefix"], r["depth"]): r["share"]
           for r in path_subtrees(frontier).collect()}
    assert out[("a.example", "/p", 1)] == 1.0
    assert out[("b.example", "/p", 1)] == 0.5
