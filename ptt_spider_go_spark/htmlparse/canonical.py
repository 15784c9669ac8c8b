"""rel=canonical extraction and alias resolution.

The reference's one site exposes one URL per article; the open web
publishes the SAME article under tracking-parameter, mirror and AMP
spellings, and declares the preferred one in-band:
`<link rel="canonical" href=...>` (RFC 6596). Honoring it is the
third alias mechanism next to redirects (X74) and mined DUST rules
(X79) — search-engine pipelines collapse duplicates on exactly this
key before content hashing ever runs.

Extraction is two regexes over the decoded page (attribute order is
free in HTML, so `rel` before `href` and `href` before `rel` are
matched separately and coalesced); href values must be quoted (the
overwhelming practice — unquoted hrefs fall through to no-claim, they
never mis-extract). Resolution handles the absolute, scheme-relative,
root-relative and directory-relative forms with JVM string functions;
dot-segments are NOT normalized here (the X66 DOM kernel carries full
RFC 3986 resolution — this operator is the no-Python fast path, and a
canonical href with ../ segments simply resolves textually).

Scale shape: a pure projection — two regexp_extracts on the html
column plus string surgery on short URLs. No shuffle, no UDF; fuses
into the scan that reads the page.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ptt_spider_go_spark.functions.columns import resolve_href

# the delimiter after 'canonical' must not consume '>': a malformed
# href-less `<link rel=canonical>` would otherwise let [^>]* walk into
# the NEXT tag and steal its href (cross-tag bug caught by the X88
# pagination twin of this regex; pinned in test_canonical_scripts)
_REL_FIRST = (
    r'(?i)<link[^>]*rel\s*=\s*["\']?canonical(?:["\'\s]|(?=>))[^>]*'
    r'href\s*=\s*["\']([^"\'>]+)')
# the trailing delimiter keeps rel tokens that merely START with
# 'canonical' (e.g. rel="canonicalized-view") from claiming; the href
# capture excludes '>' so an unterminated quote cannot run past the
# tag boundary (both pinned in tests)
_HREF_FIRST = (
    r'(?i)<link[^>]*href\s*=\s*["\']([^"\'>]+)["\'][^>]*'
    r'rel\s*=\s*["\']?canonical(?:["\'\s]|(?=>))')


def canonical_claims(pages: DataFrame) -> DataFrame:
    """(url, canonical, claimed, is_self) per page. `pages` needs
    (url, html: string — decode upstream, cf. sniff_charset). A page
    with no (or an unquoted) claim canonicalizes to itself."""
    href = F.nullif(
        F.coalesce(
            F.nullif(F.regexp_extract("html", _REL_FIRST, 1), F.lit("")),
            F.nullif(F.regexp_extract("html", _HREF_FIRST, 1), F.lit("")),
        ),
        F.lit(""),
    )
    resolved = resolve_href(F.col("url"), href)
    return pages.select(
        "url",
        F.coalesce(resolved, F.col("url")).alias("canonical"),
        href.isNotNull().alias("claimed"),
        (F.coalesce(resolved, F.col("url")) == F.col("url"))
        .alias("is_self"),
    )


def canonical_groups(claims: DataFrame) -> DataFrame:
    """(canonical, n_pages, rep_fetched): alias-group sizes over the
    claims relation — the dedup key rollup. rep_fetched marks groups
    whose canonical target was itself crawled (a group without one
    needs a frontier enqueue, not a dedup). One map-side-partial
    groupBy on the already-narrow claims."""
    return claims.groupBy("canonical").agg(
        F.count("*").cast("bigint").alias("n_pages"),
        F.max(F.col("is_self")).alias("rep_fetched"),
    )
