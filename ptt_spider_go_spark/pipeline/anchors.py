"""Anchor-text aggregation over the crawl link graph.

The reference's board-index parse is exactly a (link, anchor-text)
extraction: each `div.title a` yields an article URL plus the link's
visible text, which becomes the article's title downstream
(reference parser, parser_impl.go — the title the crawler stores IS
the anchor text of the inbound board-index link). At web scale the
same relation — who links to a URL and with what words — is one of
the strongest query-independent document signals there is (anchor
corpora power retrieval, title synthesis, and spam detection), and
building it is a classic large-scale aggregation problem: the link
relation is the biggest table a crawl owns (edges >> pages).

`anchor_summary` turns a (src_host, dst_url, anchor) link relation
into a per-target anchor profile:

    dst_url, n_inlinks, n_src_hosts, rnk, anchor, anchor_cnt

one row per (dst_url, top-k anchor), k small. Scale shape:

- one groupBy (dst_url, anchor) with map-side partial aggregation —
  the only pass over the full edge relation;
- the top-k cut is a row_number window PARTITIONED BY dst_url over
  the already-aggregated (dst_url, anchor) relation, whose size per
  partition is bounded by the distinct-anchor count of one URL (the
  thing anchor aggregation exists to compress), never by the edge
  count — no global sort, no partition-less window;
- per-URL inlink/host totals are a second groupBy of the same edge
  relation (count + count(DISTINCT src_host), both two-phase
  partial-aggregable), joined back on dst_url — an equi-join of two
  relations already hash-partitioned by the same key, so AQE plans
  it without an extra exchange on the bigger side.

Determinism: counts are exact integers; the top-k order is
(anchor_cnt DESC, anchor ASC) — total, so the oracle reproduces the
cut bit-for-bit.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ptt_spider_go_spark.pipeline.common import md5_long

#: deterministic anchor-phrase vocabulary for the synthetic link
#: relation (small on purpose: real anchor text is heavy-tailed with
#: a tiny head — 'click here' et al. — which is what makes per-URL
#: anchor histograms compressible and worth materializing).
ANCHOR_VOCAB = (
    "click here", "read more", "homepage", "details",
    "source", "link", "article",
)


def anchor_edges_from_documents(docs: DataFrame, n_hosts: int = 97,
                                outlinks: int = 3) -> DataFrame:
    """Deterministic md5-derived (src_host, dst_url, anchor) link
    relation over the documents table — the same host fan-out as
    linkrank.host_edges_from_documents (so the two graph views are
    coherent), extended with a target path and an anchor phrase."""
    links = []
    for j in range(outlinks):
        key = F.concat_ws(":", F.col("doc_id").cast("string"),
                          F.lit(str(j)))
        dst_host = F.concat(
            F.lit("h"),
            F.pmod(md5_long(key), F.lit(n_hosts)).cast("string"),
        )
        dst_url = F.concat(
            F.lit("http://"), dst_host, F.lit(".example/p"),
            F.pmod(md5_long(F.concat(key, F.lit(":p"))), F.lit(41))
            .cast("string"),
        )
        anchor_arr = F.array(*[F.lit(a) for a in ANCHOR_VOCAB])
        anchor = F.element_at(
            anchor_arr,
            (F.pmod(md5_long(F.concat(key, F.lit(":a"))),
                    F.lit(len(ANCHOR_VOCAB))) + 1).cast("int"),
        )
        links.append(F.struct(dst_url.alias("dst_url"),
                              anchor.alias("anchor")))
    src = F.concat(
        F.lit("h"), F.pmod(F.col("doc_id"), F.lit(n_hosts)).cast("string")
    ).alias("src_host")
    return (
        docs.select(src, F.explode(F.array(*links)).alias("l"))
        .select("src_host", F.col("l.dst_url").alias("dst_url"),
                F.col("l.anchor").alias("anchor"))
    )


def anchor_summary(links: DataFrame, k: int = 3) -> DataFrame:
    """(src_host, dst_url, anchor) -> per-target anchor profile:
    (dst_url, n_inlinks, n_src_hosts, rnk, anchor, anchor_cnt), one
    row per top-k anchor of each target URL. See module docstring for
    the scale shape."""
    per_anchor = (
        links.groupBy("dst_url", "anchor")
        .agg(F.count("*").cast("long").alias("anchor_cnt"))
    )
    w = Window.partitionBy("dst_url").orderBy(
        F.col("anchor_cnt").desc(), F.col("anchor").asc()
    )
    topk = (
        per_anchor.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )
    totals = links.groupBy("dst_url").agg(
        F.count("*").cast("long").alias("n_inlinks"),
        F.countDistinct("src_host").cast("long").alias("n_src_hosts"),
    )
    return totals.join(topk, "dst_url").select(
        "dst_url", "n_inlinks", "n_src_hosts", "rnk", "anchor",
        "anchor_cnt",
    )


# --- real edges: outlink extraction from crawled HTML (X66) -----------------

OUTLINK_SCHEMA = StructType([
    StructField("src_url", StringType()),
    StructField("pos", IntegerType()),
    StructField("href", StringType()),
    StructField("url", StringType()),
    StructField("anchor", StringType()),
])


def outlinks_from_pages(pages: DataFrame, url_col: str = "url",
                        html_col: str = "html") -> DataFrame:
    """pages(url, html) -> (src_url, pos, href, url, anchor): every
    a[href!=''] per page in document order, href resolved to an
    absolute URL (RFC 3986 urljoin, dot-segments included) and anchor
    text extracted on the same DOM the reference-parity kernels use
    (htmlparse/links.py).

    Scale shape: ONE projection of the pages scan (url + html only —
    Parquet column pruning keeps everything else on disk) through one
    Arrow-batched mapInPandas pass; html crosses Arrow exactly once
    and the output relation is narrow strings. No shuffle at all —
    downstream consumers (host_rank / hits_scores / anchor_summary)
    do their own keyed aggregation."""
    sel = pages.select(F.col(url_col).alias("src_url"),
                       F.col(html_col).alias("_html"))

    def run(batches):
        from ptt_spider_go_spark.htmlparse.links import extract_outlinks

        for pdf in batches:
            rows = []
            for src, blob in zip(pdf["src_url"], pdf["_html"]):
                if blob is None or src is None:
                    continue
                for r in extract_outlinks(blob, src):
                    rows.append((src, r["pos"], r["href"], r["url"],
                                 r["anchor"]))
            yield pd.DataFrame(
                rows, columns=["src_url", "pos", "href", "url", "anchor"]
            )

    return sel.mapInPandas(run, schema=OUTLINK_SCHEMA)


def host_edges_from_outlinks(outlinks: DataFrame) -> DataFrame:
    """(src_url, url) outlinks -> (src, dst) host edges with
    self-loops dropped — the REAL-graph drop-in for
    linkrank.host_edges_from_documents, so host_rank / hits_scores /
    authority_budgets run off crawled HTML unchanged. Duplicate edges
    are kept (multiplicity = endorsement weight, same contract)."""
    from ptt_spider_go_spark.functions.columns import url_host

    e = outlinks.select(
        url_host(F.col("src_url")).alias("src"),
        url_host(F.col("url")).alias("dst"),
    ).filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
    return e.filter(F.col("src") != F.col("dst"))


def anchor_links_from_outlinks(outlinks: DataFrame) -> DataFrame:
    """(src_url, url, anchor) outlinks -> the (src_host, dst_url,
    anchor) relation anchor_summary aggregates — the real-graph
    drop-in for anchor_edges_from_documents."""
    from ptt_spider_go_spark.functions.columns import url_host

    return outlinks.select(
        url_host(F.col("src_url")).alias("src_host"),
        F.col("url").alias("dst_url"),
        "anchor",
    ).filter(F.col("src_host").isNotNull())
