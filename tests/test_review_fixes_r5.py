"""Pins for the final-round review fixes (X80/X84/X85/X86/X88).

Each test pins one edge case the code-review pass surfaced: regex
token/boundary discipline, multi-meta union semantics, declared-type
family mapping, NULL-payload handling, href resolution sharing, and
prev-only pagination assembly.
"""

from ptt_spider_go_spark.htmlparse.canonical import canonical_claims
from ptt_spider_go_spark.htmlparse.hreflang import (
    hreflang_clusters, hreflang_edges,
)
from ptt_spider_go_spark.htmlparse.metarobots import robots_meta
from ptt_spider_go_spark.htmlparse.mimesniff import sniff_mime
from ptt_spider_go_spark.operators.pagination import pagination_series


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


class TestCanonicalTokenDiscipline:
    def test_prefix_token_is_not_canonical(self, spark):
        # rel="canonicalized-view" must not claim
        out = canonical_claims(_df(spark, [
            ("http://h.ex/p", '<link href="/other" '
             'rel="canonicalized-view">'),
        ], "url string, html string")).collect()[0]
        assert out["claimed"] is False
        assert out["canonical"] == "http://h.ex/p"

    def test_unterminated_quote_stays_tag_bounded(self, spark):
        # missing closing quote: the capture stops at '>' instead of
        # running to the next quote in body text
        out = canonical_claims(_df(spark, [
            ("http://h.ex/p",
             '<link rel="canonical" href="/x><p>see "this" page</p>'),
        ], "url string, html string")).collect()[0]
        assert out["canonical"] == "http://h.ex/x"


class TestRobotsMetaUnion:
    def test_multiple_metas_restrictive_union(self, spark):
        # a content-first noindex,nofollow meta followed by a
        # name-first 'all' meta: the restrictive union wins
        html = ('<meta content="noindex, nofollow" name="robots">'
                '<meta name="robots" content="all">')
        out = robots_meta(_df(spark, [("u", html)],
                              "url string, html string")).collect()[0]
        assert (out["noindex"], out["nofollow"]) == (True, True)

    def test_unterminated_content_cannot_harvest_body_text(self, spark):
        html = ('<meta name="robots" content="noindex>'
                '<p>do not nofollow me</p>')
        out = robots_meta(_df(spark, [("u", html)],
                              "url string, html string")).collect()[0]
        assert (out["noindex"], out["nofollow"]) == (True, False)

    def test_null_html_is_index_follow(self, spark):
        out = robots_meta(_df(spark, [("u", None)],
                              "url string, html string")).collect()[0]
        assert (out["noindex"], out["nofollow"]) == (False, False)


class TestMimeDeclaredFamilies:
    def test_text_based_application_types_are_text(self, spark):
        rows = [
            ("json", "application/json", b'{"a": 1}'),
            ("ldjson", "application/ld+json", b'{"@context": 1}'),
            ("xml", "application/xml", b"<?xml version='1.0'?><r/>"),
            ("js", "application/javascript", b"var a = 1;"),
        ]
        out = {r["url"]: r.asDict() for r in sniff_mime(_df(
            spark, rows,
            "url string, content_type string, html binary")).collect()}
        for u in ("json", "ldjson", "xml", "js"):
            assert out[u]["declared_family"] == "text", u
            assert bool(out[u]["mismatch"]) is False, u

    def test_null_payload_sniffs_as_nothing(self, spark):
        out = sniff_mime(_df(
            spark, [("u", "image/png", None)],
            "url string, content_type string, html binary")).collect()[0]
        assert out["mime"] is None and out["family"] is None
        assert bool(out["mismatch"]) is False


class TestHreflangResolution:
    def test_relative_hrefs_resolve_and_keys_agree(self, spark):
        # en page declares the set root-relatively, fr page declares
        # it absolutely: both must compute the SAME cluster key
        en_html = ('<link rel="alternate" hreflang="en" href="/en/p">'
                   '<link rel="alternate" hreflang="fr" href="/fr/p">')
        fr_html = ('<link rel="alternate" hreflang="en" '
                   'href="http://s.ex/en/p">'
                   '<link rel="alternate" hreflang="fr" '
                   'href="http://s.ex/fr/p">')
        edges = hreflang_edges(_df(spark, [
            ("http://s.ex/en/p", en_html),
            ("http://s.ex/fr/p", fr_html),
        ], "url string, html string"))
        assert all(r["href"].startswith("http://s.ex/")
                   for r in edges.collect())
        keys = {r["cluster_key"]
                for r in hreflang_clusters(edges).collect()}
        assert keys == {"http://s.ex/en/p"}


class TestPrevOnlyPagination:
    def test_prev_only_chain_assembles(self, spark):
        # no rel=next anywhere: prev declarations alone carry the
        # predecessor evidence
        claims = _df(spark, [
            ("p0", None, None),
            ("p1", None, "p0"),
            ("p2", None, "p1"),
        ], "url string, next_url string, prev_url string")
        out = {r["url"]: r.asDict()
               for r in pagination_series(claims).collect()}
        assert [(out[u]["series_key"], out[u]["position"])
                for u in ("p0", "p1", "p2")] == \
            [("p0", 0), ("p0", 1), ("p0", 2)]
