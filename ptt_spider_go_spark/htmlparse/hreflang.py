"""hreflang alternate extraction and language-cluster keying.

International sites publish the SAME document once per language and
declare the set in-band: `<link rel="alternate" hreflang="xx"
href=...>` per variant, plus an optional `x-default` (the HTML
standard's link types + the hreflang annotation search engines
require to be reciprocal). For a training corpus this is the third
in-band alias family after redirects/canonical (X74/X80): the
variants are *distinct texts* (so content dedup keeps them all) that
are nonetheless ONE logical document — language-mixture accounting
(X31's rebalancing) and train/eval decontamination want them keyed
together, and a crawler that already holds one variant can
deprioritize fetching the other five.

Unlike rel=canonical (one claim per page — one regex), a page carries
MANY hreflang links, so extraction is tag-wise: regexp_extract_all
pulls every `<link ...>` tag, a JVM transform filters to
rel~alternate tags carrying both hreflang and a quoted href, and the
survivors explode into (url, pos, hreflang, href) edge rows. All
attribute pairs are matched in either order; hreflang values are
case-folded (BCP 47 tags are case-insensitive).

`hreflang_clusters` rolls edges into one row per declaring page with
the deterministic cluster key = lexical min over {url} ∪ {declared
hrefs}: every member of a reciprocal cluster (each variant lists the
same set) computes the SAME key, so the key joins variants without
any graph iteration — the one-hop special case of the alias-group
rollup that redirects need pointer doubling (X74) to reach.

Scale shape: extraction is a pure projection (regexes + array ops,
JVM-side, fuses into the scan); the rollup is one groupBy(url) over
short edge rows. No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ptt_spider_go_spark.functions.columns import resolve_href

_TAG = r"(?i)<link[^>]*>"
_REL_ALT = r"(?i)rel\s*=\s*[\"']?([a-z\- ]*\balternate\b)"
# captures exclude '>' so an unterminated quote stays tag-bounded
_LANG = r"(?i)hreflang\s*=\s*[\"']([^\"'>]+)[\"']"
_HREF = r"(?i)href\s*=\s*[\"']([^\"'>]+)[\"']"


def hreflang_edges(pages: DataFrame) -> DataFrame:
    """(url, pos, hreflang, href, is_x_default) per declared
    alternate, pos numbering emitted edges in document order.
    `pages` needs (url, html: string)."""
    tags = F.expr(f"regexp_extract_all(html, '{_TAG}', 0)")
    alts = F.filter(
        tags,
        lambda t: (F.regexp_extract(t, _REL_ALT, 1) != "")
        & (F.regexp_extract(t, _LANG, 1) != "")
        & (F.regexp_extract(t, _HREF, 1) != ""),
    )
    edges = pages.select(
        "url", F.posexplode(alts).alias("pos", "tag"))
    lang = F.lower(F.regexp_extract("tag", _LANG, 1))
    # resolve relative hrefs against the declaring page (shared
    # helper): without this, '/fr/p' sorts before any 'http://...'
    # and cluster keys diverge between variants that declare the
    # same set in different spellings — and bare-path keys would
    # collide ACROSS hosts
    href = resolve_href(F.col("url"),
                        F.regexp_extract("tag", _HREF, 1))
    return edges.select(
        "url",
        "pos",
        lang.alias("hreflang"),
        href.alias("href"),
        (lang == "x-default").alias("is_x_default"),
    )


def hreflang_clusters(edges: DataFrame) -> DataFrame:
    """(url, n_alts, n_langs, has_x_default, cluster_key) per
    declaring page; cluster_key identical across all members of a
    reciprocal cluster."""
    rolled = edges.groupBy("url").agg(
        F.count("*").alias("n_alts"),
        F.countDistinct("hreflang").alias("n_langs"),
        F.max("is_x_default").alias("has_x_default"),
        F.min("href").alias("_min_href"),
    )
    return rolled.select(
        "url", "n_alts", "n_langs", "has_x_default",
        F.least(F.col("_min_href"), F.col("url")).alias("cluster_key"),
    )
