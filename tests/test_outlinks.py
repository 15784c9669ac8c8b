"""Outlink extraction (htmlparse/links.py + pipeline/anchors.py):
RFC 3986 resolution corners, DOM robustness (both parse paths), and
the composition into the link-graph operators. (Spark-vs-DuckDB
parity on the synthetic envelope is additionally enforced by the
`extract_outlinks` contract query.)
"""

from pyspark.sql import functions as F

from ptt_spider_go_spark.htmlparse.links import extract_outlinks
from ptt_spider_go_spark.pipeline import anchors

BASE = "http://h.example/a/b/page.html"


def _links(html, base=BASE):
    return [(r["pos"], r["href"], r["url"], r["anchor"])
            for r in extract_outlinks(html, base)]


def test_resolution_corners():
    html = (
        '<a href="http://x.example/abs">abs</a>'
        '<a href="//y.example/pr">proto-rel</a>'
        '<a href="/root">root</a>'
        '<a href="sib.html">sibling</a>'
        '<a href="../up.html">up</a>'
        '<a href="?q=1">query-only</a>'
        '<a href="#frag">frag-only</a>'
    )
    assert _links(html) == [
        (0, "http://x.example/abs", "http://x.example/abs", "abs"),
        (1, "//y.example/pr", "http://y.example/pr", "proto-rel"),
        (2, "/root", "http://h.example/root", "root"),
        (3, "sib.html", "http://h.example/a/b/sib.html", "sibling"),
        (4, "../up.html", "http://h.example/a/up.html", "up"),
        (5, "?q=1", "http://h.example/a/b/page.html?q=1", "query-only"),
        (6, "#frag", "http://h.example/a/b/page.html#frag", "frag-only"),
    ]


def test_skips_and_pos_numbering():
    """href-less and empty-href anchors are not links; pos numbers
    EMITTED links only, in document order across nesting."""
    html = (
        '<a name="x">no href</a>'
        '<div><a href="/one">one</a>'
        '<span><a href="">empty</a></span></div>'
        '<a href="/two">two</a>'
    )
    assert _links(html) == [
        (0, "/one", "http://h.example/one", "one"),
        (1, "/two", "http://h.example/two", "two"),
    ]


def test_markup_robustness():
    """Nested tags inside anchors, entities, single quotes, attribute
    order, and uppercase names all extract identically."""
    html = (
        "<A CLASS='c' HREF='/up'><b>bold</b> &amp; tail</A>"
        '<a data-x="1" href="/attr">attr order</a>'
    )
    assert _links(html) == [
        (0, "/up", "http://h.example/up", "bold & tail"),
        (1, "/attr", "http://h.example/attr", "attr order"),
    ]


def test_fallback_path_identical():
    """A <script> block forces the html.parser fallback; the link set
    must be identical to the same document without it."""
    core = '<a href="/x">x</a><a href="/y"><i>y</i></a>'
    fast = _links(core)
    slow = _links("<script>var a = '<a href=/fake>';</script>" + core)
    assert fast == slow
    assert fast == [(0, "/x", "http://h.example/x", "x"),
                    (1, "/y", "http://h.example/y", "y")]


def test_outlinks_from_pages_and_graph_composition(spark):
    """pages -> outlinks -> host edges (self-loops dropped) + anchor
    relation -> anchor_summary / hits_scores all compose."""
    from ptt_spider_go_spark.operators import linkrank

    pages = spark.createDataFrame(
        [
            ("http://a.example/i",
             '<a href="http://b.example/p">go b</a>'
             '<a href="/self">self</a>'
             '<a href="http://c.example/p">go c</a>'),
            ("http://b.example/i",
             '<a href="http://c.example/p">go c</a>'),
        ],
        "url string, html string",
    )
    out = anchors.outlinks_from_pages(pages)
    assert out.count() == 4

    edges = anchors.host_edges_from_outlinks(out)
    got = {(r["src"], r["dst"]) for r in edges.collect()}
    assert got == {("a.example", "b.example"), ("a.example", "c.example"),
                   ("b.example", "c.example")}  # /self loop dropped

    prof = {
        (r["dst_url"], r["rnk"]): (r["anchor"], r["n_inlinks"],
                                   r["n_src_hosts"])
        for r in anchors.anchor_summary(
            anchors.anchor_links_from_outlinks(out)).collect()
    }
    assert prof[("http://c.example/p", 1)] == ("go c", 2, 2)

    hits = {r["host"]: (r["hub_micro"], r["auth_micro"])
            for r in linkrank.hits_scores(edges).collect()}
    assert hits["c.example"][1] > hits["b.example"][1]  # 2 inlinks > 1
    assert hits["a.example"][0] > 0 and hits["a.example"][1] == 0


def test_binary_html_column(spark):
    """pages.html as BINARY (the input_hint shape) parses the same."""
    pages = spark.createDataFrame(
        [("http://a.example/i",
          bytearray('<a href="/x">café 饕餮</a>'.encode()))],
        "url string, html binary",
    )
    [r] = anchors.outlinks_from_pages(pages).collect()
    assert (r["url"], r["anchor"]) == ("http://a.example/x", "café 饕餮")


def test_discover_frontier_stages(spark):
    """Hand pages: fragment spellings collapse to one candidate, ad
    hosts drop, seen URLs drop, never-seen clean URLs survive."""
    from ptt_spider_go_spark.plans.discover import discover_frontier

    pages = spark.createDataFrame(
        [
            ("http://a.example/i",
             '<a href="http://new.example/p#x">n</a>'
             '<a href="HTTP://NEW.EXAMPLE/p#y">n2</a>'      # same canon
             '<a href="http://spam.ads.example/p">ad</a>'
             '<a href="http://old.example/p">seen</a>'),
        ],
        "url string, html string",
    )
    seen = spark.createDataFrame([("http://old.example/p",)], "url string")
    bl = spark.createDataFrame([("ads.example",)], "pattern string")
    got = {r["url"] for r in
           discover_frontier(pages, seen, blocklist=bl).collect()}
    assert got == {"http://new.example/p"}


def test_discover_frontier_honor_nofollow(spark):
    """Opt-in X84 gate: a nofollow page contributes no outlinks;
    default-off parity preserved."""
    from ptt_spider_go_spark.plans.discover import discover_frontier

    pages = spark.createDataFrame(
        [
            ("http://a.example/i",
             '<meta name="robots" content="nofollow">'
             '<a href="http://dontfollow.example/p">x</a>'),
            ("http://b.example/i",
             '<a href="http://follow.example/p">y</a>'),
        ],
        "url string, html string",
    )
    seen = spark.createDataFrame([], "url string")
    on = {r["url"] for r in discover_frontier(
        pages, seen, honor_nofollow=True).collect()}
    assert on == {"http://follow.example/p"}
    off = {r["url"] for r in discover_frontier(pages, seen).collect()}
    assert off == {"http://follow.example/p",
                   "http://dontfollow.example/p"}


def test_discover_frontier_bloom_layers_exact(spark):
    """The Bloom(+cuckoo) layers never change the discovered set —
    false-positive-prone filters are verification-backed."""
    from ptt_spider_go_spark.operators.dedup import (
        BloomShardSet, CuckooShardSet,
    )
    from ptt_spider_go_spark.plans.discover import discover_frontier

    links = "".join(
        f'<a href="http://h{i % 13}.example/p{i}">x</a>' for i in range(200)
    )
    pages = spark.createDataFrame(
        [("http://s.example/i", f"<html><body>{links}</body></html>")],
        "url string, html string",
    )
    seen = spark.createDataFrame(
        [(f"http://h{i % 13}.example/p{i}",) for i in range(0, 200, 3)],
        "url string",
    )
    plain = {r["url"] for r in discover_frontier(pages, seen).collect()}
    blooms = BloomShardSet()
    blooms.add_df(seen)
    cuckoos = CuckooShardSet.for_capacity(blooms.n_shards, 256)
    cuckoos.add_df(seen)
    layered = {r["url"] for r in discover_frontier(
        pages, seen, blooms=blooms, cuckoos=cuckoos).collect()}
    assert layered == plain
    assert len(plain) == 200 - len(range(0, 200, 3))


def test_discover_frontier_full_normalize(spark):
    """Opt-in X96 frontier keys: dot-segment and percent-escape
    spellings of one resource collapse to a single candidate under
    full_normalize=True; default-off keeps the canonicalize_url keys
    (both spellings survive) so pinned outputs are untouched."""
    from ptt_spider_go_spark.plans.discover import discover_frontier

    pages = spark.createDataFrame(
        [
            ("http://a.example/i",
             '<a href="http://new.example/a/./b/../p">s1</a>'
             '<a href="http://new.example/a/%70">s2</a>'),
        ],
        "url string, html string",
    )
    on = {r["url"] for r in discover_frontier(
        pages, None, full_normalize=True).collect()}
    assert on == {"http://new.example/a/p"}

    off = {r["url"] for r in discover_frontier(pages, None).collect()}
    assert off == {"http://new.example/a/./b/../p",
                   "http://new.example/a/%70"}


def test_discover_funnel_stage_counts(spark):
    """X108: the four stage counts over a hand page — 4 raw edges
    (one canonical URL referenced twice), 3 canonical keys, 2 after
    the blocklist, 1 after the seen set; zero-seed on a link-less
    page set; full_normalize merges dot-segment spellings at stage 1."""
    from ptt_spider_go_spark.plans.discover import discover_funnel

    pages = spark.createDataFrame(
        [
            ("http://a.example/i",
             '<a href="http://n.example/p#x">1</a>'
             '<a href="HTTP://N.EXAMPLE/p#y">2</a>'     # same canon as 1
             '<a href="http://spam.ads.example/p">3</a>'
             '<a href="http://old.example/p">4</a>'),
        ],
        "url string, html string",
    )
    seen = spark.createDataFrame([("http://old.example/p",)], "url string")
    bl = spark.createDataFrame([("ads.example",)], "pattern string")
    got = {r["stage"]: r["n_urls"] for r in
           discover_funnel(pages, seen, blocklist=bl).collect()}
    assert got == {"outlinks": 4, "canonical": 3, "unblocked": 2,
                   "novel": 1}

    empty = pages.filter("url IS NULL")
    z = {r["stage"]: r["n_urls"] for r in
         discover_funnel(empty, None).collect()}
    assert z == {"outlinks": 0, "canonical": 0, "unblocked": 0, "novel": 0}

    dots = spark.createDataFrame(
        [("http://a.example/i",
          '<a href="http://n.example/a/./p">1</a>'
          '<a href="http://n.example/a/x/../p">2</a>')],
        "url string, html string",
    )
    plain = {r["stage"]: r["n_urls"] for r in
             discover_funnel(dots, None).collect()}
    full = {r["stage"]: r["n_urls"] for r in
            discover_funnel(dots, None, full_normalize=True).collect()}
    assert (plain["outlinks"], plain["canonical"]) == (2, 2)
    assert (full["outlinks"], full["canonical"]) == (2, 1)
