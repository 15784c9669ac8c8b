"""Generic outlink extraction from HTML — the edge source of the link
graph.

The reference extracts exactly two link families from a page: article
links with their titles from board indexes (parser_impl.go:24-63 —
`div.title a`, where the anchor TEXT becomes the stored title) and
image hrefs from articles (parser_impl.go:92-110 — every `a[href]`).
A web-scale crawl needs the general form of the same walk: EVERY
`a[href]` with its resolved absolute URL and its anchor text, because
that relation feeds frontier discovery, PageRank/HITS host authority
(operators/linkrank.py), and anchor-text aggregation
(pipeline/anchors.py).

`extract_outlinks` runs on the same strict-tokenizer/html.parser DOM
as the reference-parity kernels (htmlparse/dom.py), so a page parses
identically whether it is being mined for articles or for edges.
Relative references resolve with urllib.parse.urljoin — stdlib,
RFC 3986 §5-correct including dot-segments, protocol-relative
references, and query-only references; resolution happens inside the
already-Python Arrow kernel, so it costs nothing extra and avoids a
lookahead-regex resolver that the JVM and DuckDB could not share.

Skips mirror the reference's stance (parser_impl.go:94: attribute
must EXIST): anchors without an href attribute are not links;
empty-string hrefs are self-references and are skipped too (urljoin
would resolve them to the base, flooding the graph with loops).
`pos` numbers EMITTED links in document order.
"""

from __future__ import annotations

from urllib.parse import urljoin

from ptt_spider_go_spark.htmlparse.dom import parse_html
from ptt_spider_go_spark.htmlparse.ptt import trim_space


def extract_outlinks(html: str | bytes, base_url: str) -> list[dict]:
    """HTML -> [{pos, href, url, anchor}] for every `a[href!='']` in
    document order: raw href, RFC 3986-resolved absolute URL, and the
    trimmed anchor text (concatenated descendant text nodes, entities
    decoded — the same .text() the title extraction uses)."""
    doc = parse_html(html)
    out: list[dict] = []
    for a in doc.find("a"):
        href = a.attrs.get("href")
        if not href:
            continue
        out.append({
            "pos": len(out),
            "href": href,
            "url": urljoin(base_url, href),
            "anchor": trim_space(a.text()),
        })
    return out
