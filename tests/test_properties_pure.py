"""Hypothesis property tests over the pure-Python kernels (no Spark —
these run in milliseconds and hit edge cases the fixture goldens and
the batch fuzzers don't enumerate)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from ptt_spider_go_spark.config import parse_go_duration_ms
from ptt_spider_go_spark.htmlparse.files import (
    clean_file_name,
    image_file_names,
)
from ptt_spider_go_spark.sources.robots import parse_robots_txt

# --- clean_file_name ------------------------------------------------------

@given(st.text(max_size=40))
@settings(max_examples=300, deadline=None)
def test_clean_file_name_idempotent_and_clean(s):
    once = clean_file_name(s)
    assert clean_file_name(once) == once           # idempotent
    assert not set(once) & set('\\/:*?"<>|')       # actually clean


# --- collision suffixing (filename.go:31-49) ------------------------------

@given(st.lists(st.sampled_from(
    ["a.jpg", "a.png", "b.jpg", "a_2.jpg", "noext", "x.y.z"]), max_size=12))
@settings(max_examples=300, deadline=None)
def test_image_file_names_unique_and_positional(urls):
    names = image_file_names(urls)
    assert len(names) == len(urls)                 # 1:1 with input
    assert len(set(names)) == len(names)           # never collides
    # a base name not yet EMITTED (verbatim or as a generated suffix)
    # is kept verbatim; one already taken gets a suffixed variant —
    # including the jump-over-taken case (filename_test.go:76-83) where
    # an earlier generated "a_2.jpg" displaces a literal "a_2.jpg"
    emitted = set()
    for u, n in zip(urls, names):
        if u not in emitted:
            assert n == u
        else:
            assert n != u and n not in list(emitted - {n})
        emitted.add(n)


# --- Go duration parser ---------------------------------------------------

@given(st.lists(
    st.tuples(st.integers(0, 999), st.sampled_from(["ms", "s", "m", "h"])),
    min_size=1, max_size=4,
))
@settings(max_examples=300, deadline=None)
def test_parse_go_duration_composed_units(parts):
    s = "".join(f"{v}{u}" for v, u in parts)
    unit_ms = {"ms": 1, "s": 1000, "m": 60_000, "h": 3_600_000}
    want = sum(v * unit_ms[u] for v, u in parts)
    assert parse_go_duration_ms(s, default_ms=-1) == want


@given(st.text(alphabet="0123456789smh.x ", max_size=12))
@settings(max_examples=300, deadline=None)
def test_parse_go_duration_never_crashes_and_falls_back(s):
    out = parse_go_duration_ms(s, default_ms=12345.0)
    assert isinstance(out, float) or isinstance(out, int)


# --- robots parser --------------------------------------------------------

@given(st.lists(st.sampled_from([
    "User-agent: *", "User-agent: gb", "Disallow: /a/", "Disallow:",
    "Allow: /a/b/", "Crawl-delay: 5", "# comment", "", "junk line",
    "Sitemap: https://x/s.xml",
]), max_size=15))
@settings(max_examples=300, deadline=None)
def test_parse_robots_never_crashes_and_rules_well_formed(lines):
    body = "\n".join(lines)
    for agent in ("*", "gb", "other"):
        rules = parse_robots_txt(body, agent)
        for prefix, allowed in rules:
            assert prefix                      # empty Disallow never emits
            assert isinstance(allowed, bool)
    # exact-agent rules are a superset decision: if the body has no
    # gb group with rules, gb falls back to exactly the * rules
    if "User-agent: gb" not in lines:
        assert parse_robots_txt(body, "gb") == parse_robots_txt(body, "*")


# --- fast tokenizer safety property (htmlparse/dom.py) --------------------

_HTML_BITS = st.lists(
    st.one_of(
        st.sampled_from([
            "<div>", "</div>", '<div class="r-ent">', "<a href='x.jpg'>",
            "</a>", "<br>", "<img src=u/>", "<!-- c -->", "<!DOCTYPE html>",
            "<?pi?>", "<span>", "</span>", "<script>", "</script>",
            "<![CDATA[x]]>", "<", ">", "&amp;", "&lt;", "text 標題 ",
            "a&b", '<a href="&quot;q">', "<a href=>", "< div>", "<a b=`x`>",
        ]),
        st.text(max_size=8),
    ),
    max_size=12,
).map("".join)


@given(_HTML_BITS)
@settings(max_examples=300, deadline=None)
def test_fast_tokenizer_never_diverges(html):
    """On ANY input the fast tokenizer either declines (None -> the
    html.parser fallback runs) or produces the byte-identical tree.
    There is no third outcome — the strict grammar guarantees the fast
    path never silently mis-parses what it accepts."""
    from ptt_spider_go_spark.htmlparse.dom import _fast_parse, parse_html_slow

    def tree(n):
        if isinstance(n, str):
            return ("#text", n)
        return (n.tag, sorted(n.attrs.items()),
                [tree(c) for c in n.children])

    fast = _fast_parse(html)
    if fast is not None:
        assert tree(fast) == tree(parse_html_slow(html))
