"""Golden tests for the pure-Python parser layer.

Expectations are pinned to the reference parser's behavior
(/root/reference/ptt/parser_impl.go, ptt/parser_impl_test.go,
internal/fileutil/filename_test.go) on freshly-authored fixtures that
exercise the same cases as the reference fixtures.
"""

from pathlib import Path

import pytest

from ptt_spider_go_spark.htmlparse.files import (
    clean_file_name,
    image_file_name,
    image_file_names,
    unique_in_order,
)
from ptt_spider_go_spark.htmlparse.ptt import (
    decode_push_rate,
    extract_text,
    normalize_img_href,
    parse_article_content,
    parse_articles,
    parse_max_page,
)

FIXTURES = Path(__file__).parent / "fixtures"
BOARD_HTML = (FIXTURES / "board_index.html").read_text()
ARTICLE_HTML = (FIXTURES / "article_page.html").read_text()


# --- C1 push-rate decode (parser_impl.go:46-60, parser_impl_test.go) -----

@pytest.mark.parametrize(
    "raw,expected",
    [
        ("爆", 100),
        ("99", 99),
        ("1", 1),
        ("X5", -5),
        ("XX", 0),        # Atoi("X") fails -> 0
        ("X", 0),         # Atoi("") fails -> 0
        ("", 0),
        ("  爆  ", 100),  # trimmed first
        ("abc", 0),
        ("X12", -12),
        ("-3", -3),       # Atoi handles signs
    ],
)
def test_decode_push_rate(raw, expected):
    assert decode_push_rate(raw) == expected


# --- P1 board-list parse (parser_impl.go:24-71) ---------------------------

def test_parse_articles_golden():
    rows = parse_articles(BOARD_HTML)
    # 7 .r-ent divs: deleted (no .title a) and 公告 are skipped -> 5 rows.
    assert [r["title"] for r in rows] == [
        "[問卦] 第一篇熱門文",
        "[新聞] 第二篇普通文",
        "[黑特] 第三篇噓文",
        "[閒聊] 純X無數字",
        "[問卦] 無推文標記",
    ]
    assert [r["push_rate"] for r in rows] == [100, 99, -5, 0, 0]
    assert [r["author"] for r in rows] == [
        "alice01", "bob_02", "carol-3", "dan04", "eve05",
    ]
    assert rows[0]["url"] == "https://www.ptt.cc/bbs/Gossiping/M.2000000001.A.AAA.html"
    assert [r["pos"] for r in rows] == [0, 1, 2, 3, 4]


def test_parse_articles_bytes_input():
    rows = parse_articles(BOARD_HTML.encode("utf-8"))
    assert len(rows) == 5


# --- P2 article-content parse (parser_impl.go:74-113) ---------------------

def test_parse_article_content_golden():
    title, imgs = parse_article_content(ARTICLE_HTML)
    assert title == "[問卦] 第一篇熱門文"
    # Document order; scheme fixups; imgur .jpg appended; album + pdf +
    # no-href excluded; duplicate KEPT (dedup happens downstream).
    assert imgs == [
        "https://i.imgur.com/pic1.jpg",
        "https://cdn.example.net/photo2.png",
        "https://legacy.example.org/anim3.gif",
        "https://imgur.com/AbCd123.jpg",
        "https://i.imgur.com/pic1.jpg",
    ]


def test_parse_article_content_no_title_block():
    html = "<html><body><a href='https://x.test/a.png'>x</a></body></html>"
    title, imgs = parse_article_content(html)
    assert title == ""
    assert imgs == ["https://x.test/a.png"]


@pytest.mark.parametrize(
    "href,expected",
    [
        ("https://i.imgur.com/x.jpg", "https://i.imgur.com/x.jpg"),
        ("//i.imgur.com/y.png", "https://i.imgur.com/y.png"),
        ("http://example.com/z.gif", "https://example.com/z.gif"),
        ("https://imgur.com/abcd", "https://imgur.com/abcd.jpg"),
        ("https://imgur.com/a/album", None),
        ("https://example.com/doc.pdf", None),
        ("http://imgur.com/noext", "http://imgur.com/noext.jpg"),  # verbatim + .jpg (no scheme fixup in imgur branch)
        ("https://x.test/photo.jpeg", "https://x.test/photo.jpeg"),
    ],
)
def test_normalize_img_href(href, expected):
    assert normalize_img_href(href) == expected


# --- P3 max page (parser_impl.go:116-139) ----------------------------------

def test_parse_max_page_golden():
    # ‹ 上頁 -> index2345.html -> 2345 + 1 = 2346
    assert parse_max_page(BOARD_HTML) == 2346


def test_parse_max_page_missing_button():
    assert parse_max_page("<html><body>nothing</body></html>") is None


def test_parse_max_page_malformed_number():
    html = (
        '<div class="btn-group btn-group-paging">'
        '<a href="/bbs/B/indexabc.html">‹ 上頁</a></div>'
    )
    assert parse_max_page(html) is None


# --- C5/C4/D2 filename derivation (filename.go, filename_test.go) ----------

@pytest.mark.parametrize(
    "url,expected",
    [
        ("https://i.imgur.com/abc.jpg", "abc.jpg"),
        ("https://example.com/path/to/photo.png?w=100&h=50", "photo.png"),
        ("https://example.com/pic.gif#frag", "pic.gif"),
        ("https://imgur.com/abcd", "abcd.jpg"),
        ("https://example.com/noext", "noext"),
    ],
)
def test_image_file_name(url, expected):
    assert image_file_name(url) == expected


def test_image_file_names_collisions():
    # Two hosts, same basename -> a.jpg, a_2.jpg (collision_test.go:64-67).
    urls = ["https://h1.test/a.jpg", "https://h2.test/a.jpg"]
    assert image_file_names(urls) == ["a.jpg", "a_2.jpg"]


def test_image_file_names_jump_over_taken():
    # Pre-existing a_2.jpg forces the later duplicate of a.jpg to a_3.jpg
    # (filename_test.go:76-83).
    urls = [
        "https://h1.test/a_2.jpg",
        "https://h1.test/a.jpg",
        "https://h2.test/a.jpg",
    ]
    assert image_file_names(urls) == ["a_2.jpg", "a.jpg", "a_3.jpg"]


def test_image_file_names_no_ext_collision():
    urls = ["https://h1.test/x", "https://h2.test/x"]
    assert image_file_names(urls) == ["x", "x_2"]


# --- C6 title sanitize + D1 dedup ------------------------------------------

def test_clean_file_name():
    assert clean_file_name(r'a\b/c:d*e?f"g<h>i|j') == "abcdefghij"
    assert clean_file_name("中文 標題 ok") == "中文 標題 ok"


def test_unique_in_order():
    assert unique_in_order(["b", "a", "b", "c", "a"]) == ["b", "a", "c"]


# --- P4 byte-identical text -------------------------------------------------

def test_extract_text_roundtrip_stability():
    t1 = extract_text(ARTICLE_HTML)
    t2 = extract_text(ARTICLE_HTML.encode("utf-8"))
    assert t1 == t2
    assert "[問卦] 第一篇熱門文" in t1
    assert "正文開始" in t1


def test_extract_text_entities_decoded():
    assert extract_text("<p>a &amp; b &lt;c&gt;</p>") == "a & b <c>"


# --- fast tokenizer == html.parser equivalence (dom.py) -------------------

def _tree(n):
    from ptt_spider_go_spark.htmlparse.dom import Node
    if not isinstance(n, Node):
        return ("#text", n)
    return (n.tag, sorted(n.attrs.items()), [_tree(c) for c in n.children])


def test_fast_tokenizer_matches_htmlparser_on_fixtures_and_datagen():
    """The strict fast tokenizer must build the IDENTICAL tree (tags,
    attrs, text nodes, nesting) as the html.parser fallback on every
    golden fixture and on a spread of datagen pages — and it must
    actually ENGAGE there (no silent fallback on the hot path)."""
    from ptt_spider_go_spark.datagen import _spec_to_row
    from ptt_spider_go_spark.htmlparse.dom import _fast_parse, parse_html_slow

    docs = [BOARD_HTML, ARTICLE_HTML]
    for kind, b, p, slot in [
        ("landing", "Beauty", 40, -1), ("index", "Beauty", 40, -1),
        ("index", "Gossiping", 39, -1), ("article", "Beauty", 40, 1),
        ("article", "Gossiping", 39, 3), ("article", "Beauty", 38, 5),
    ]:
        r = _spec_to_row(kind, b, p, slot, 42, 6, 8)
        if r is not None:
            docs.append(r["html"].decode("utf-8"))
    for h in docs:
        fast = _fast_parse(h)
        assert fast is not None, "fast path fell back on clean input"
        assert _tree(fast) == _tree(parse_html_slow(h))


@pytest.mark.parametrize(
    "snippet",
    [
        # entity refs in text AND attribute values
        '<div class="a&amp;b" title=unquoted>x &lt;3 &amp; y &#33;</div>',
        # comments, doctype, PI, self-closing + void elements
        '<!DOCTYPE html><!-- c --><?pi junk?><div><br><img src="u"/></div>tail',
        # stray end tags, implicit closes, nested same-class divs
        '<div class="r-ent"><div class="r-ent"><span>a</span></div></div></b>',
        # attribute without value / empty value / single quotes / dupes
        "<a href='' download data-x=1 href='b'>t</a>",
        # unicode + whitespace shapes
        '<div class="title">\n  [公告] 標題 　 tail\n</div>',
    ],
)
def test_fast_tokenizer_equivalence_snippets(snippet):
    from ptt_spider_go_spark.htmlparse.dom import _fast_parse, parse_html_slow

    fast = _fast_parse(snippet)
    assert fast is not None
    assert _tree(fast) == _tree(parse_html_slow(snippet))


@pytest.mark.parametrize(
    "snippet",
    [
        "<script>if (a<b) {}</script><div>x</div>",   # rawtext mode
        "<style>a>b{}</style>ok",
        "invalid < alone",                             # bare '<' as text
        "<![CDATA[ x ]]><div>y</div>",                 # marked section
        "<div foo=`bar`>odd</div>",                    # backtick junk
        "<div",                                        # unterminated
    ],
)
def test_fast_tokenizer_falls_back_and_parse_html_still_works(snippet):
    """Constructs outside the strict grammar must return None from the
    fast path (never a wrong tree) and parse_html must transparently
    produce the html.parser result."""
    from ptt_spider_go_spark.htmlparse.dom import (
        _fast_parse,
        parse_html,
        parse_html_slow,
    )

    assert _fast_parse(snippet) is None
    assert _tree(parse_html(snippet)) == _tree(parse_html_slow(snippet))
