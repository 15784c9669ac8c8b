"""rel=canonical extraction (X80) and Unicode-script mix (X81)."""

from ptt_spider_go_spark.htmlparse.canonical import (
    canonical_claims, canonical_groups,
)
from ptt_spider_go_spark.pipeline.textstats import script_mix


def _claims(spark, rows):
    df = spark.createDataFrame(rows, "url string, html string")
    return {r["url"]: r.asDict() for r in canonical_claims(df).collect()}


class TestCanonicalClaims:
    def test_attribute_orders_and_resolution(self, spark):
        out = _claims(spark, [
            ("http://h.example/dir/a", '<link rel="canonical" '
             'href="http://h.example/c1">'),
            ("http://h.example/dir/b", '<link href="/c1" rel=canonical>'),
            ("http://h.example/dir/c",
             "<link rel='canonical' href='//h.example/c1'>"),
            ("http://h.example/dir/d", '<link rel=canonical href="c1">'),
            ("http://h.example/dir/e", "<html>no claim</html>"),
        ])
        assert out["http://h.example/dir/a"]["canonical"] == \
            "http://h.example/c1"
        assert out["http://h.example/dir/b"]["canonical"] == \
            "http://h.example/c1"
        assert out["http://h.example/dir/c"]["canonical"] == \
            "http://h.example/c1"
        # directory-relative resolves against the page's directory
        assert out["http://h.example/dir/d"]["canonical"] == \
            "http://h.example/dir/c1"
        e = out["http://h.example/dir/e"]
        assert e["canonical"] == e["url"]
        assert e["claimed"] is False and e["is_self"] is True

    def test_self_claim_is_self(self, spark):
        out = _claims(spark, [
            ("http://h.example/p", '<link rel="canonical" '
             'href="http://h.example/p">'),
        ])
        r = out["http://h.example/p"]
        assert r["claimed"] is True and r["is_self"] is True

    def test_unquoted_href_falls_through(self, spark):
        # unquoted hrefs are out of contract: no claim, never a
        # mis-extraction
        out = _claims(spark, [
            ("http://h.example/p",
             "<link rel=canonical href=http://evil.example/x>"),
        ])
        assert out["http://h.example/p"]["canonical"] == \
            "http://h.example/p"

    def test_host_only_page_url(self, spark):
        # no path slash after the authority: relative href must not
        # eat the host
        out = _claims(spark, [
            ("http://h.example", '<link rel="canonical" href="c">'),
        ])
        assert out["http://h.example"]["canonical"] == "http://h.example/c"

    def test_groups_rollup(self, spark):
        claims = canonical_claims(spark.createDataFrame([
            ("http://h.example/a",
             '<link rel="canonical" href="http://h.example/c">'),
            ("http://h.example/b",
             '<link rel="canonical" href="http://h.example/c">'),
            ("http://h.example/c", "<html>the canonical itself</html>"),
            ("http://h.example/lone", "<html>x</html>"),
        ], "url string, html string"))
        out = {r["canonical"]: r.asDict()
               for r in canonical_groups(claims).collect()}
        g = out["http://h.example/c"]
        assert g["n_pages"] == 3 and g["rep_fetched"] is True
        assert out["http://h.example/lone"]["n_pages"] == 1


class TestScriptMix:
    def _mix(self, spark, rows):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        return {r["doc_id"]: r.asDict() for r in script_mix(df).collect()}

    def test_counts_sum_exactly(self, spark):
        out = self._mix(spark, [(1, "abc 你好 мир 42!")])
        r = out[1]
        assert (r["n_latin"], r["n_cjk"], r["n_cyrillic"]) == (3, 2, 3)
        assert r["n_latin"] + r["n_cjk"] + r["n_cyrillic"] + \
            r["n_other"] == r["n_chars"]

    def test_dominant_and_ties(self, spark):
        out = self._mix(spark, [
            (1, "hello world"),
            (2, "你好世界你好世界 ok"),
            (3, "привет мир hi"),
            (4, "1234 5678"),
            (5, "ab你好"),  # tie latin==cjk -> latin wins the order
        ])
        assert out[1]["dominant"] == "latin"
        assert out[2]["dominant"] == "cjk"
        assert out[3]["dominant"] == "cyrillic"
        assert out[4]["dominant"] == "none"
        assert out[5]["dominant"] == "latin"
