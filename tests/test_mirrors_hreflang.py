"""Mirror-host detection (X83), meta robots (X84), hreflang (X85)."""

from ptt_spider_go_spark.htmlparse.hreflang import (
    hreflang_clusters, hreflang_edges,
)
from ptt_spider_go_spark.htmlparse.metarobots import (
    corpus_gate, follow_gate, robots_meta,
)
from ptt_spider_go_spark.operators.mirrors import mirror_pairs


def _pages(spark, rows, schema="url string, text string"):
    return spark.createDataFrame(rows, schema)


class TestMirrorPairs:
    def test_containment_and_hot_hash_cut(self, spark):
        # big host serves a..e, small host serves a..c plus one own
        # page; a third host shares only the boilerplate stub, which
        # sits on ALL hosts and must be cut by the cap.
        rows = []
        for i, t in enumerate("abcde"):
            rows.append((f"http://big.ex/p{i}", f"content {t}"))
        for i, t in enumerate("abc"):
            rows.append((f"http://small.ex/p{i}", f"content {t}"))
        rows.append(("http://small.ex/own", "small own page"))
        rows.append(("http://other.ex/own", "other own page"))
        for h in ("big.ex", "small.ex", "other.ex"):
            rows.append((f"http://{h}/stub", "boilerplate"))
        out = {(r["host_a"], r["host_b"]): r.asDict()
               for r in mirror_pairs(_pages(spark, rows),
                                     hot_hash_cap=2).collect()}
        # boilerplate df=3 > cap=2 -> other.ex is witnessed by nothing
        assert set(out) == {("big.ex", "small.ex")}
        p = out[("big.ex", "small.ex")]
        # profiles: big {a..e, stub}=6, small {a,b,c,own,stub}=5
        assert (p["shared"], p["n_a"], p["n_b"]) == (3, 6, 5)
        assert p["containment_ppm"] == 3 * 1_000_000 // 5
        assert p["jaccard_ppm"] == 3 * 1_000_000 // 8
        assert bool(p["is_mirror"]) is (p["containment_ppm"] >= 600_000)

    def test_full_containment_of_small_host(self, spark):
        # a tiny host fully inside a big one is a mirror even though
        # Jaccard is low -- the containment (not Jaccard) test.
        rows = [(f"http://big.ex/p{i}", f"c{i}") for i in range(10)]
        rows += [("http://tiny.ex/a", "c0"), ("http://tiny.ex/b", "c1")]
        p = mirror_pairs(_pages(spark, rows)).collect()[0]
        assert p["containment_ppm"] == 1_000_000
        assert bool(p["is_mirror"]) is True
        assert p["jaccard_ppm"] == 2 * 1_000_000 // 10

    def test_within_host_duplicates_count_once(self, spark):
        # the profile is a SET of hashes: serving the same body on
        # ten urls adds nothing.
        rows = [(f"http://a.ex/p{i}", "same body") for i in range(10)]
        rows += [("http://b.ex/x", "same body")]
        p = mirror_pairs(_pages(spark, rows)).collect()[0]
        assert (p["shared"], p["n_a"], p["n_b"]) == (1, 1, 1)
        assert p["containment_ppm"] == 1_000_000


ROBOTS_CASES = [
    ('<meta name="robots" content="noindex, nofollow">', True, True),
    ('<meta content="nofollow" name=robots>', False, True),
    ('<meta name=robots content="none">', True, True),
    ('<meta name="robots" content="index, follow">', False, False),
    ("", False, False),
    ('<META NAME="ROBOTS" CONTENT="NOINDEX">', True, False),
]

DECOY = '<meta name="description" content="noindex nofollow decoy">'


class TestRobotsMeta:
    def test_all_spellings_with_decoy(self, spark):
        rows = [(f"http://r.ex/p{i}", f"<head>{DECOY}{tag}</head>")
                for i, (tag, _, _) in enumerate(ROBOTS_CASES)]
        out = {r["url"]: r.asDict() for r in robots_meta(
            _pages(spark, rows, "url string, html string")).collect()}
        for i, (_, noindex, nofollow) in enumerate(ROBOTS_CASES):
            r = out[f"http://r.ex/p{i}"]
            assert (r["noindex"], r["nofollow"]) == (noindex, nofollow), i

    def test_unquoted_content_falls_through(self, spark):
        out = robots_meta(_pages(
            spark, [("u", "<meta name=robots content=noindex>")],
            "url string, html string")).collect()[0]
        assert (out["noindex"], out["nofollow"]) == (False, False)

    def test_substring_tokens_do_not_match(self, spark):
        # 'noindexing' is an unknown token, not noindex
        out = robots_meta(_pages(
            spark, [("u", '<meta name="robots" content="noindexing">')],
            "url string, html string")).collect()[0]
        assert (out["noindex"], out["nofollow"]) == (False, False)

    def test_gates(self, spark):
        pages = _pages(spark, [
            ("u1", f'<meta name="robots" content="noindex">'),
            ("u2", f'<meta name="robots" content="nofollow">'),
            ("u3", "<p>plain</p>"),
        ], "url string, html string")
        meta = robots_meta(pages)
        links = _pages(spark, [("u1", "t1"), ("u2", "t2"), ("u3", "t3")],
                       "url string, target string")
        kept = {r["url"] for r in follow_gate(links, meta).collect()}
        assert kept == {"u1", "u3"}  # nofollow page loses its edges
        docs = {r["url"] for r in corpus_gate(pages, meta).collect()}
        assert docs == {"u2", "u3"}  # noindex page leaves the corpus


HL = "http://hl.ex"


def _variant_html(langs, x_default=False):
    tags = ['<link rel="stylesheet" href="/s.css">',
            '<link rel="alternate" type="application/rss+xml" '
            'href="/feed">']
    for lg in langs:
        tags.append(f'<link rel="alternate" hreflang="{lg}" '
                    f'href="{HL}/{lg}/p">')
    if x_default:
        tags.append(f'<link rel="alternate" hreflang="x-default" '
                    f'href="{HL}/en/p">')
    return "<head>" + "".join(tags) + "</head>"


class TestHreflang:
    def test_edges_order_spellings_decoys(self, spark):
        html = ('<head><link rel="stylesheet" href="/s.css">'
                f'<link rel="alternate" hreflang="en" href="{HL}/en/p">'
                f'<link href="{HL}/fr/p" hreflang="FR" rel="alternate">'
                f'<link rel=alternate hreflang="de" href="{HL}/de/p">'
                '<link rel="alternate" type="application/rss+xml" '
                'href="/feed">'
                f'<link rel="alternate" hreflang="x-default" '
                f'href="{HL}/en/p"></head>')
        rows = hreflang_edges(_pages(
            spark, [(f"{HL}/en/p", html)],
            "url string, html string")).collect()
        got = [(r["pos"], r["hreflang"], r["href"], r["is_x_default"])
               for r in sorted(rows, key=lambda r: r["pos"])]
        assert got == [
            (0, "en", f"{HL}/en/p", False),
            (1, "fr", f"{HL}/fr/p", False),   # uppercase folded
            (2, "de", f"{HL}/de/p", False),   # unquoted rel
            (3, "x-default", f"{HL}/en/p", True),
        ]

    def test_alternate_without_hreflang_is_not_an_edge(self, spark):
        rows = hreflang_edges(_pages(
            spark,
            [("u", '<link rel="alternate" href="http://x/feed">')],
            "url string, html string")).collect()
        assert rows == []

    def test_cluster_key_reciprocal(self, spark):
        langs = ["en", "fr", "de"]
        rows = [(f"{HL}/{lg}/p", _variant_html(langs, x_default=True))
                for lg in langs]
        out = {r["url"]: r.asDict() for r in hreflang_clusters(
            hreflang_edges(_pages(
                spark, rows, "url string, html string"))).collect()}
        keys = {r["cluster_key"] for r in out.values()}
        assert keys == {f"{HL}/de/p"}  # lexical min, same for all
        for r in out.values():
            assert (r["n_alts"], r["n_langs"]) == (4, 4)
            assert bool(r["has_x_default"]) is True

    def test_silent_page_absent(self, spark):
        rows = hreflang_clusters(hreflang_edges(_pages(
            spark, [("u", "<head>no links</head>")],
            "url string, html string"))).collect()
        assert rows == []
