"""Crawl-quality gate funnel (X89): attrition across the four gates."""

import hashlib

from ptt_spider_go_spark.pipeline.webgates import crawl_gate_funnel

NOIDX = '<meta name="robots" content="noindex">'
OK = "<p>x</p>"


def _funnel(spark, pages, rules):
    p = spark.createDataFrame(
        pages, "url string, status int, text string, html string")
    r = spark.createDataFrame(rules, "kind string, key string")
    out = crawl_gate_funnel(p, r).collect()
    return {row["stage"]: row.asDict() for row in out}


class TestCrawlGateFunnel:
    def test_each_gate_drops_its_victim(self, spark):
        # good.ex: healthy host. bad.ex: all soft-404 stubs (drop).
        # m1/m2.ex: mirrors (m2 dropped). good.ex/p2 is noindex;
        # good.ex/p3 is taken down by url rule.
        pages = [
            ("http://good.ex/p1", 200, "alpha body", OK),
            ("http://good.ex/p2", 200, "beta body", NOIDX),
            ("http://good.ex/p3", 200, "gamma body", OK),
            ("http://bad.ex/p1", 200, "page not found", OK),
            ("http://bad.ex/p2", 200, "page not found", OK),
            ("http://m1.ex/p1", 200, "shared one", OK),
            ("http://m1.ex/p2", 200, "shared two", OK),
            ("http://m2.ex/p1", 200, "shared one", OK),
            ("http://m2.ex/p2", 200, "shared two", OK),
        ]
        rules = [("url", "http://good.ex/p3")]
        out = _funnel(spark, pages, rules)
        assert out["raw"]["n_pages"] == 9
        assert out["indexable"]["n_pages"] == 8      # -noindex
        assert out["host_ok"]["n_pages"] == 6        # -bad.ex (2)
        assert out["unmirrored"]["n_pages"] == 4     # -m2.ex (2)
        assert out["retained"]["n_pages"] == 3       # -takedown
        # char mass tracks the same survivors
        assert out["raw"]["n_chars"] == sum(
            len(t) for (_, _, t, _) in pages)
        assert out["retained"]["n_chars"] == \
            len("alpha body") + len("shared one") + len("shared two")

    def test_zero_row_stages_still_present(self, spark):
        # a host-wide takedown of the only host: retained reports 0,
        # and every stage row exists
        pages = [("http://a.ex/p1", 200, "body", OK)]
        out = _funnel(spark, pages, [("host", "a.ex")])
        assert set(out) == {"raw", "indexable", "host_ok",
                            "unmirrored", "retained"}
        assert out["retained"]["n_pages"] == 0
        assert out["retained"]["n_chars"] == 0

    def test_host_evidence_is_pre_gate(self, spark):
        # the broken host's noindex pages still count toward its
        # soft-404 verdict: gating first would launder the host
        pages = [
            ("http://b.ex/p1", 200, "page not found", NOIDX),
            ("http://b.ex/p2", 200, "page not found", NOIDX),
            ("http://b.ex/p3", 200, "real body here", OK),
        ]
        out = _funnel(spark, pages, [])
        # 2/3 soft-404s -> drop verdict computed over ALL pages, so
        # the surviving indexable page still dies at host_ok
        assert out["indexable"]["n_pages"] == 1
        assert out["host_ok"]["n_pages"] == 0
