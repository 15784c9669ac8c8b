"""Conditional-request planning (X78) and DUST parameter mining (X79)."""

import datetime

from ptt_spider_go_spark.operators.dust import dust_params
from ptt_spider_go_spark.operators.recrawl import revalidation_plan


def _ts(day):
    return datetime.datetime(2026, 8, day, 0, 0, 0)


class TestRevalidationPlan:
    def _plan(self, spark, rows):
        df = spark.createDataFrame(
            rows, "url string, fetched_at timestamp, etag string,"
                  " last_modified string")
        return {r["url"]: (r["mode"], r["validator"])
                for r in revalidation_plan(df).collect()}

    def test_etag_beats_last_modified(self, spark):
        out = self._plan(spark, [
            ("a", _ts(1), '"x1"', "Sat, 01 Aug 2026 00:00:00 GMT"),
            ("b", _ts(1), None, "Sat, 01 Aug 2026 00:00:00 GMT"),
            ("c", _ts(1), None, None),
        ])
        assert out["a"] == ("if-none-match", '"x1"')
        assert out["b"] == ("if-modified-since",
                            "Sat, 01 Aug 2026 00:00:00 GMT")
        assert out["c"] == ("unconditional", None)

    def test_newest_observation_wins_wholesale(self, spark):
        # the newer fetch has NO etag: its last_modified must be used,
        # never the stale etag from the older row
        out = self._plan(spark, [
            ("a", _ts(1), '"old"', None),
            ("a", _ts(20), None, "Thu, 20 Aug 2026 00:00:00 GMT"),
        ])
        assert out["a"] == ("if-modified-since",
                            "Thu, 20 Aug 2026 00:00:00 GMT")

    def test_empty_string_etag_absent(self, spark):
        out = self._plan(spark, [
            ("a", _ts(1), "", "Sat, 01 Aug 2026 00:00:00 GMT"),
            ("b", _ts(1), "", ""),
        ])
        assert out["a"][0] == "if-modified-since"
        assert out["b"] == ("unconditional", None)


class TestDustParams:
    def _mine(self, spark, rows, **kw):
        df = spark.createDataFrame(rows, "url string, content_hash string")
        return {(r["host"], r["param"]): r["support"]
                for r in dust_params(df, **kw).collect()}

    def test_session_param_mined_page_param_not(self, spark):
        rows = []
        for i in range(3):
            rows += [
                (f"http://h.example/a{i}", f"h{i}"),
                (f"http://h.example/a{i}?sid={i}7", f"h{i}"),
                # page changes the content hash -> a separate group,
                # which ALSO evidences sid (present in one member)
                (f"http://h.example/a{i}?page=2", f"h{i}p2"),
                (f"http://h.example/a{i}?page=2&sid={i}9", f"h{i}p2"),
            ]
        out = self._mine(spark, rows)
        # 2 groups per content id x 3 ids; page never varies within a
        # group, so it is never mined
        assert out == {("h.example", "sid"): 6}

    def test_min_support_threshold(self, spark):
        rows = [
            ("http://h.example/a", "h1"),
            ("http://h.example/a?sid=1", "h1"),
        ]
        assert self._mine(spark, rows) == {}  # support 1 < default 2
        assert self._mine(spark, rows, min_support=1) == {
            ("h.example", "sid"): 1}

    def test_param_in_every_member_not_mined(self, spark):
        # both params present in ALL members (only VALUES differ):
        # presence-based mining has no removal evidence for either —
        # a member lacking the param is what licenses stripping it
        rows = [
            ("http://h.example/a?utm=x&sid=1", "h1"),
            ("http://h.example/a?utm=x&sid=2", "h1"),
        ]
        assert self._mine(spark, rows, min_support=1) == {}
        # add a bare member: utm AND sid both become strippable
        rows.append(("http://h.example/a", "h1"))
        assert self._mine(spark, rows, min_support=1) == {
            ("h.example", "utm"): 1, ("h.example", "sid"): 1}

    def test_hosts_isolated(self, spark):
        rows = [
            ("http://a.example/p", "h1"),
            ("http://a.example/p?sid=1", "h1"),
            # same path+hash spelling on another host: separate group
            ("http://b.example/p", "h1x"),
            ("http://b.example/p?sid=2", "h1x"),
        ]
        out = self._mine(spark, rows, min_support=1)
        assert out == {("a.example", "sid"): 1, ("b.example", "sid"): 1}

    def test_duplicate_param_single_url_counts_once(self, spark):
        # '?sid=1&sid=2' must count its URL once: present-in-all,
        # so NOT mined
        rows = [
            ("http://h.example/a?sid=1&sid=2", "h1"),
            ("http://h.example/a?sid=3", "h1"),
        ]
        assert self._mine(spark, rows, min_support=1) == {}
