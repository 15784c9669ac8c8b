"""Pagination chain assembly from rel=next/prev declarations.

The reference's one pagination scheme is arithmetic — board index
pages are numbered `index{N}.html` and the crawler enumerates them
from the probed max page (crawler.go's page loop; C8's max-page
arithmetic). The open web paginates by DECLARATION instead: `<link
rel="next">` / `rel="prev"` (the HTML standard's sequential link
types, long used by search engines to stitch multi-page articles).
A corpus pipeline wants the stitched view — a 30-page article is ONE
logical document for dedup/packing, a comment thread's pages should
carry one series key, and an unbounded rel=next walk (calendar pages
generating forever) is a crawler trap that must surface as such
rather than loop.

Extraction mirrors rel=canonical (X80): both attribute orders as
coalesced regexes per direction, quoted hrefs only, absolute /
scheme-relative / root-relative / directory-relative resolution with
JVM string functions.

Assembly rides the SAME pointer-doubling engine as redirect
resolution (X74, operators/redirects.py): next-edges form a
functional graph (one next per page), so walking every page BACKWARD
along its unique predecessor reaches the series HEAD in
ceil(log2(max_len+1)) self-join rounds — the head (no incoming next)
becomes the series key and the exact hop count becomes the page's
position. Conflicting predecessors (two pages declaring the same
next — forum software does this at page-merge seams) collapse
deterministically to the lexical-min claimant; pagination CYCLES
(last page pointing back to the first) reach no head, come back
status='capped' from the engine, and surface as status='broken' with
NULL key/position — the declarative twin of the trap gate (X58).

Scale shape: extraction is a pure projection; predecessor choice is
one groupBy(next_url) with a map-side-partial min; assembly is
O(log max_len) equi-join rounds on a one-row-per-page mapping with
lineage cut per round; the rollup is one groupBy(series_key). No
driver state, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ptt_spider_go_spark.functions.columns import resolve_href
from ptt_spider_go_spark.operators.redirects import resolve_redirects

# the delimiter after the rel value must NOT consume '>': a bare
# `rel=next>` tag has no href, and eating the '>' would let the
# trailing [^>]* walk into the NEXT tag and steal its href (caught by
# TestExtraction; same fix applied to htmlparse/canonical.py). The
# href captures exclude '>' so an unterminated quote cannot run past
# the tag boundary.
_NEXT_REL_FIRST = (
    r'(?i)<link[^>]*rel\s*=\s*["\']?next(?:["\'\s]|(?=>))[^>]*'
    r'href\s*=\s*["\']([^"\'>]+)')
_NEXT_HREF_FIRST = (
    r'(?i)<link[^>]*href\s*=\s*["\']([^"\'>]+)["\'][^>]*'
    r'rel\s*=\s*["\']?next["\'\s>]')
_PREV_REL_FIRST = (
    r'(?i)<link[^>]*rel\s*=\s*["\']?prev(?:ious)?(?:["\'\s]|(?=>))[^>]*'
    r'href\s*=\s*["\']([^"\'>]+)')
_PREV_HREF_FIRST = (
    r'(?i)<link[^>]*href\s*=\s*["\']([^"\'>]+)["\'][^>]*'
    r'rel\s*=\s*["\']?prev(?:ious)?["\'\s>]')


def _extract(first: str, second: str) -> Column:
    return F.nullif(
        F.coalesce(
            F.nullif(F.regexp_extract("html", first, 1), F.lit("")),
            F.nullif(F.regexp_extract("html", second, 1), F.lit("")),
        ),
        F.lit(""),
    )


def next_prev_claims(pages: DataFrame) -> DataFrame:
    """(url, next_url, prev_url) per page, resolved absolute; NULL
    when not declared. `pages` needs (url, html: string)."""
    nxt = _extract(_NEXT_REL_FIRST, _NEXT_HREF_FIRST)
    prv = _extract(_PREV_REL_FIRST, _PREV_HREF_FIRST)
    u = F.col("url")
    return pages.select(
        "url",
        resolve_href(u, nxt).alias("next_url"),
        resolve_href(u, prv).alias("prev_url"),
    )


def pagination_series(claims: DataFrame, max_len: int = 64) -> DataFrame:
    """(url, series_key, position, status) per page in `claims`.
    status='ok' pages carry the head URL as series_key and their
    exact 0-based position; cycle/over-long members are
    status='broken' with NULLs.

    Predecessor evidence comes from BOTH directions — a next-edge
    q->p says q precedes p, and p's own prev declaration says the
    same thing from the other side — so prev-only sites (rel=prev
    without rel=next exists in the wild) still assemble, and on
    consistent sites the two sources agree and dedup in the min."""
    from_next = (
        claims.filter(F.col("next_url").isNotNull())
        .select(F.col("next_url").alias("page"),
                F.col("url").alias("pred"))
    )
    from_prev = (
        claims.filter(F.col("prev_url").isNotNull())
        .select(F.col("url").alias("page"),
                F.col("prev_url").alias("pred"))
    )
    # unique predecessor per page: conflicting claimants collapse to
    # the lexical min so the walk stays functional and deterministic
    rev = (
        from_next.unionByName(from_prev)
        .groupBy(F.col("page").alias("src"))
        .agg(F.min("pred").alias("dst"))
    )
    heads = resolve_redirects(rev, max_hops=max_len)
    out = (
        claims.select("url").distinct()
        .join(heads, "url", "left")
    )
    no_row = F.col("status").isNull()  # page with no pagination edges
    ok = no_row | (F.col("status") == "ok")
    return out.select(
        "url",
        F.when(no_row, F.col("url"))
        .when(ok, F.col("final_url")).alias("series_key"),
        F.when(no_row, F.lit(0))
        .when(ok, F.col("hops")).cast("int").alias("position"),
        F.when(ok, F.lit("ok")).otherwise(F.lit("broken"))
        .alias("status"),
    )


def stitch_series(docs: DataFrame, series: DataFrame) -> DataFrame:
    """(series_key, n_pages, text): status='ok' members concatenated
    in position order with a blank line between pages — the stitched
    logical document dedup/packing should see instead of N page
    fragments (the whole point of assembling the chain). `docs`
    needs (url, text).

    Scale shape: one equi-join on url (both sides page-grain), one
    groupBy(series_key) whose collect_list is bounded by the
    assembler's max_len (a series longer than that was already
    'broken'), sorted in-row by (position, text) so the result is
    deterministic even on forked trees with duplicated positions.
    The page texts move through ONE shuffle, already reduced to the
    columns the stitch needs."""
    members = (
        series.filter(F.col("status") == "ok")
        .join(docs.select("url", "text"), "url")
    )
    parts = F.array_sort(
        F.collect_list(F.struct("position", "text")))
    return (
        members.groupBy("series_key")
        .agg(F.count("*").alias("n_pages"), parts.alias("_parts"))
        .select(
            "series_key", "n_pages",
            F.concat_ws(
                "\n\n",
                F.transform(F.col("_parts"), lambda s: s["text"]))
            .alias("text"),
        )
    )


def series_rollup(series: DataFrame) -> DataFrame:
    """(series_key, n_pages, max_position, complete) over status='ok'
    members: complete when positions are exactly 0..n-1 (positions
    are distinct by the functional-walk property, so the check is
    max = n-1)."""
    return (
        series.filter(F.col("status") == "ok")
        .groupBy("series_key")
        .agg(F.count("*").alias("n_pages"),
             F.max("position").alias("max_position"))
        .withColumn(
            "complete",
            F.col("max_position") == (F.col("n_pages") - F.lit(1))
            .cast("int"))
    )
