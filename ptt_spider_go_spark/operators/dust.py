"""DUST-style irrelevant-query-parameter mining.

Different URLs with Similar Text (Bar-Yossef et al., "Do not crawl in
the DUST", WWW'07): session ids, tracking params (`utm_*`) and other
content-irrelevant query parameters multiply every page into many
frontier entries, and at 10^10-URL scale they are the single biggest
source of wasted fetches. The frontier canonicalizer
(functions/columns.py) can strip a parameter per host — this operator
MINES which parameters are safe to strip, from crawl evidence the
pipeline already has: the (url, content_hash) relation (snapshot_diff
hashes text anyway).

Evidence rule: a duplicate-content group = same (host, path,
content_hash) reached by >= 2 distinct URLs — members differ only in
their query strings. A parameter is a strip candidate when, within
such a group, SOME members carry it and some do not (its presence
demonstrably did not change the content). Parameters carried by every
member of every group (e.g. `page=1` when different pages hash
differently) never qualify — discrimination, not popularity. Support
counts the number of independent groups exhibiting the variation.

Scale shape: query parsing is JVM string/array functions (no UDF);
one groupBy for group sizes over the narrow (host, path, hash, url)
projection; one explode of param NAMES only (values never move); one
groupBy((host, param)) with map-side partial counts. The text itself
was hashed upstream — nothing heavier than URLs ever shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ptt_spider_go_spark.functions.columns import url_host


def dust_params(pages: DataFrame, min_support: int = 2) -> DataFrame:
    """(host, param, support) — query parameters whose removal is
    supported by >= min_support duplicate-content groups on that
    host. `pages` needs (url, content_hash)."""
    base = pages.select(
        "url", "content_hash",
        url_host(F.col("url")).alias("host"),
        F.split(F.col("url"), r"\?", 2).alias("_parts"),
    ).select(
        "url", "content_hash", "host",
        F.element_at("_parts", 1).alias("path"),
        # try_element_at: a query-less URL splits into one part (ANSI
        # element_at would throw on the missing index)
        F.coalesce(F.try_element_at("_parts", F.lit(2)),
                   F.lit("")).alias("_q"),
        # param NAMES only; '&&' and bare '?' leave empty fragments
        F.filter(
            F.transform(
                F.split(F.coalesce(F.try_element_at("_parts", F.lit(2)),
                                   F.lit("")), "&"),
                lambda kv: F.element_at(F.split(kv, "=", 2), 1),
            ),
            lambda p: p != "",
        ).alias("params"),
    ).dropDuplicates(["url"])

    grp = ["host", "path", "content_hash"]
    sizes = base.groupBy(*grp).agg(F.count("*").alias("_n"))
    dup = base.join(sizes, grp).where(F.col("_n") >= 2)

    # per (group, param): in how many member urls does it appear?
    with_param = (
        # array_distinct: '?a=1&a=2' must count its url once, not twice
        dup.select(*grp, "_n",
                   F.explode(F.array_distinct("params")).alias("param"))
        .groupBy(*grp, "_n", "param")
        .agg(F.count("*").alias("_with"))
    )
    varied = with_param.where(F.col("_with") < F.col("_n"))
    return (
        varied.groupBy("host", "param")
        .agg(F.count("*").cast("bigint").alias("support"))
        .where(F.col("support") >= min_support)
    )
