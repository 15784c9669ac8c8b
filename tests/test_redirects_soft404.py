"""Redirect-chain resolution (X74) and soft-404 detection (X75)."""

import pytest

from pyspark.sql import functions as F

from ptt_spider_go_spark.operators.redirects import resolve_redirects
from ptt_spider_go_spark.operators.soft404 import soft404_scores


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _by_url(df):
    return {r["url"]: r.asDict() for r in df.collect()}


class TestResolveRedirects:
    def test_chain_terminal_and_hops(self, spark):
        # a -> b -> c (terminal); d isolated terminal via dst-only
        out = _by_url(resolve_redirects(
            _edges(spark, [("a", "b"), ("b", "c"), ("x", "d")])))
        assert out["a"] == {"url": "a", "final_url": "c", "hops": 2,
                            "status": "ok"}
        assert out["b"]["final_url"] == "c" and out["b"]["hops"] == 1
        assert out["c"] == {"url": "c", "final_url": "c", "hops": 0,
                            "status": "ok"}
        assert out["d"]["hops"] == 0 and out["x"]["hops"] == 1

    def test_cycle_capped(self, spark):
        # http<->https bounce plus an entry ramp: e -> a -> b -> a
        out = _by_url(resolve_redirects(
            _edges(spark, [("e", "a"), ("a", "b"), ("b", "a")])))
        for u in ("e", "a", "b"):
            assert out[u]["status"] == "capped"
            assert out[u]["final_url"] is None
            assert out[u]["hops"] is None

    def test_over_cap_chain(self, spark):
        # length-5 chain with max_hops=3: far nodes capped, near ok
        chain = [(f"u{i}", f"u{i+1}") for i in range(5)]
        out = _by_url(resolve_redirects(_edges(spark, chain), max_hops=3))
        assert out["u0"]["status"] == "capped"
        assert out["u1"]["status"] == "capped"
        assert out["u2"] == {"url": "u2", "final_url": "u5", "hops": 3,
                             "status": "ok"}
        assert out["u5"]["hops"] == 0

    def test_exact_hop_counts_long_chain(self, spark):
        # doubling must report TRUE distances, not powers of two
        chain = [(f"u{i}", f"u{i+1}") for i in range(7)]
        out = _by_url(resolve_redirects(_edges(spark, chain), max_hops=8))
        for i in range(8):
            assert out[f"u{i}"]["hops"] == 7 - i
            assert out[f"u{i}"]["final_url"] == "u7"

    def test_chain_length_exactly_max_hops(self, spark):
        # the fuzzer-caught boundary: done-freezing lags the horizon
        # by one round (2^r - 1 coverage), so a chain of length
        # EXACTLY max_hops must still resolve
        chain = [(f"u{i}", f"u{i+1}") for i in range(8)]
        out = _by_url(resolve_redirects(_edges(spark, chain), max_hops=8))
        assert out["u0"] == {"url": "u0", "final_url": "u8", "hops": 8,
                             "status": "ok"}

    def test_round_count_is_logarithmic(self, spark):
        # max_hops=8 resolves any length-<=8 chain in 4 doubling
        # rounds (2^4 - 1 = 15 >= 8); the public API has no stats
        # hook, so pin the invariant the implementation derives
        # rounds from.
        import math
        assert math.ceil(math.log2(8 + 1)) == 4


class TestSoft404:
    def _pages(self, spark, rows):
        return spark.createDataFrame(
            rows, "url string, status int, text string")

    def test_keyword_and_tiny_signals(self, spark):
        long = "real content " * 50  # 650 chars
        rows = (
            [(f"http://a.example/p{i}", 200, long) for i in range(8)]
            + [("http://a.example/oops", 200,
                "Sorry, this Page Not Found here")]
            + [("http://a.example/stub", 200, "gone")]
            + [("http://a.example/hard", 404, "Page Not Found")]
        )
        out = _by_url(soft404_scores(self._pages(spark, rows)))
        assert out["http://a.example/oops"]["kw_hits"] == 1
        assert out["http://a.example/oops"]["soft404"] is True
        # tiny: 5*4*cnt < total over the host's 200s
        assert out["http://a.example/stub"]["tiny"] is True
        assert out["http://a.example/stub"]["soft404"] is True
        # a proper 404 is NOT a soft404 (and never tiny)
        assert out["http://a.example/hard"]["soft404"] is False
        assert out["http://a.example/hard"]["tiny"] is False
        # honest pages pass
        assert out["http://a.example/p0"]["soft404"] is False

    def test_host_isolation(self, spark):
        # a short page on a short-page host is NOT tiny — the length
        # baseline is per-host, not global
        rows = (
            [(f"http://big.example/p{i}", 200, "x" * 1000)
             for i in range(5)]
            + [(f"http://small.example/p{i}", 200, "tweet sized")
               for i in range(5)]
        )
        out = _by_url(soft404_scores(self._pages(spark, rows)))
        assert out["http://small.example/p0"]["tiny"] is False
        assert out["http://small.example/p0"]["soft404"] is False
        assert out["http://small.example/p0"]["host"] == "small.example"

    def test_phrase_list_all_match(self, spark):
        from ptt_spider_go_spark.operators.soft404 import SOFT404_PHRASES
        rows = [(f"http://h.example/p{i}", 200,
                 "padding text " * 10 + p.upper())
                for i, p in enumerate(SOFT404_PHRASES)]
        out = soft404_scores(self._pages(spark, rows))
        assert out.agg(F.min("kw_hits")).collect()[0][0] >= 1
        assert out.where(~F.col("soft404")).count() == 0
