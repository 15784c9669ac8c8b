"""Page-level robots directives: `<meta name="robots">` noindex/nofollow.

robots.txt (R1, sources/robots.py) speaks for a HOST before the fetch;
the robots *meta tag* speaks for one PAGE after it (the HTML standard's
`name=robots` metadata; Google/Bing honor `noindex`, `nofollow`,
`none`). A crawl pipeline needs both halves: `noindex` pages are
fetched but excluded from the corpus (they still yield outlinks);
`nofollow` pages contribute NO outlinks to frontier discovery (every
edge on the page is dropped, the per-page analogue of rel=nofollow).
The reference has no analogue — its one board exposes no robots
metadata — so this is pure web-scale surface next to rel=canonical
(X80), with the same extraction discipline.

Extraction mirrors htmlparse/canonical.py: attribute order is free in
HTML, so `name` before `content` and `content` before `name` are two
regexes coalesced; `name=robots` may be unquoted, content values must
be quoted (unquoted content falls through to no-directives — never a
mis-extraction, and a decoy `<meta name=description content="noindex">`
can never match because the name is anchored). Directive strings are
comma/space-separated case-insensitive tokens; `none` is defined as
`noindex, nofollow`. Unknown tokens are ignored (the standard's rule).

Scale shape: a pure projection — two regexp_extracts plus a token-
array membership test, all JVM-side; fuses into the page scan. The
gate composition (`follow_gate`) is a broadcast-free semi-filter on
the already-extracted flags.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# content captures exclude '>' so an unterminated quote cannot run
# past the tag boundary and harvest directive-looking words from body
# text (pinned). A name-first tag can only match the first pattern
# and a content-first tag only the second, so concatenating both
# regexp_extract_all results walks every robots meta exactly once.
_NAME_FIRST = (
    r'(?i)<meta[^>]*name\s*=\s*["\']?robots["\'\s][^>]*'
    r'content\s*=\s*["\']([^"\'>]*)')
_CONTENT_FIRST = (
    r'(?i)<meta[^>]*content\s*=\s*["\']([^"\'>]*)["\'][^>]*'
    r'name\s*=\s*["\']?robots["\'\s>]')


def _directives(html: Column) -> Column:
    """Lower-cased token array over the UNION of every robots meta's
    content — when a page carries several (CMS plugins stack them),
    the restrictive union is the semantics search engines apply, so
    one 'noindex' among them wins whatever the others say. Empty
    array when the page carries none."""
    h = F.coalesce(html, F.lit(""))  # a NULL page has no directives
    contents = F.concat(
        F.regexp_extract_all(h, F.lit(_NAME_FIRST), F.lit(1)),
        F.regexp_extract_all(h, F.lit(_CONTENT_FIRST), F.lit(1)),
    )
    toks = F.filter(
        F.flatten(F.transform(
            contents, lambda c: F.split(F.lower(c), r"[,\s]+"))),
        lambda t: t != "",
    )
    return toks


def robots_meta(pages: DataFrame) -> DataFrame:
    """(url, noindex, nofollow) per page. `pages` needs (url,
    html: string — decode upstream, cf. sniff_charset). A page with
    no robots meta (or an unquoted content value) is index+follow."""
    toks = _directives(F.col("html"))
    none_ = F.array_contains(toks, "none")
    return pages.select(
        "url",
        (F.array_contains(toks, "noindex") | none_).alias("noindex"),
        (F.array_contains(toks, "nofollow") | none_).alias("nofollow"),
    )


def follow_gate(outlinks: DataFrame, meta: DataFrame) -> DataFrame:
    """Drop every outlink row whose SOURCE page is nofollow: the
    page-level edge gate between extract_outlinks (X66) and frontier
    discovery (X68). `outlinks` needs a `url` column naming the
    source page; `meta` is robots_meta's output. Left-semi shape on
    the co-keyed url — no new columns, no fanout."""
    follow = meta.filter(~F.col("nofollow")).select("url")
    return outlinks.join(follow, "url", "left_semi")


def corpus_gate(docs: DataFrame, meta: DataFrame) -> DataFrame:
    """Drop noindex pages from the corpus side (they remain valid
    link sources). Same left-semi shape keyed on url."""
    keep = meta.filter(~F.col("noindex")).select("url")
    return docs.join(keep, "url", "left_semi")
