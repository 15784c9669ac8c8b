"""Sitemap seed source (sitemaps.org protocol subset).

Production crawls seed from robots.txt `Sitemap:` directives and the
sitemap files behind them; a sitemap is either a `<urlset>` of page
entries or a `<sitemapindex>` of nested sitemap references — a crawler
must distinguish them (pages go to the fetch frontier, nested sitemaps
back to the sitemap fetcher). This parser is the Spark-side flatten of
both shapes.

No XML library: the sitemap protocol's entry grammar is regular
(`<url>/<sitemap>` blocks holding `<loc>` + optional `<lastmod>`), so
block extraction is two `regexp_extract_all` passes with (?s) — both
run JVM-side, and the DuckDB oracle runs the SAME regexes (the
engine-agnostic split, same argument as the trap rules). Entries keep
their `lastmod` string for the freshness scheduler (operators/recrawl)
to consume.

Scale shape: one xml-column projection + two explodes; stateless, no
shuffle. A 50k-URL sitemap file is one row; a million-sitemap corpus
partitions by file like any other text-ish source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_LOC = "<loc>\\s*(.*?)\\s*</loc>"
_LASTMOD = "<lastmod>\\s*(.*?)\\s*</lastmod>"


def _entries_of(df: DataFrame, block_tag: str, kind: str) -> DataFrame:
    block_pat = f"(?s)<{block_tag}>(.*?)</{block_tag}>"
    blocks = df.select(
        F.explode(
            F.regexp_extract_all(F.col("xml"), F.lit(block_pat), F.lit(1))
        ).alias("block")
    )
    return blocks.select(
        F.lit(kind).alias("kind"),
        F.regexp_extract(F.col("block"), _LOC, 1).alias("url"),
        F.nullif(
            F.regexp_extract(F.col("block"), _LASTMOD, 1), F.lit("")
        ).alias("lastmod"),
    ).filter(F.col("url") != "")


def sitemap_entries(sitemaps: DataFrame) -> DataFrame:
    """(kind, url, lastmod) from a frame with an `xml` column holding
    sitemap documents: kind 'page' for `<url>` entries (frontier
    seeds), 'sitemap' for `<sitemap>` index entries (fetch-and-recurse
    targets); lastmod is the raw protocol string (NULL when absent)."""
    return _entries_of(sitemaps, "url", "page").unionByName(
        _entries_of(sitemaps, "sitemap", "sitemap")
    )
