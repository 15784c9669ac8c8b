"""Soft-404 detection: 200-status pages that are really error pages.

Misconfigured servers answer missing resources with HTTP 200 + an
"oops, not found" body; a crawler that trusts the status code pollutes
the corpus with millions of near-identical error stubs (the reference
is spared only because ptt.cc 404s properly — over the open web this
is a standard crawl-quality gate; cf. Bar-Yossef et al., "Sic transit
gloria telae", WWW'04, which detects soft 404s by content rather than
status).

Two content signals, both relational and integer-exact:

- **keyword hits**: how many canonical not-found phrases the
  lower-cased body contains ("page not found", "error 404", ... ) —
  pure string containment, no UDF.
- **tiny-for-host**: error stubs are far shorter than the host's real
  pages. A page is tiny when `len < host_mean/5`, evaluated as the
  integer cross-multiplication `5*len*cnt < total_len` over the host's
  status-200 pages — no division, no floats, so the DuckDB oracle
  matches bit-for-bit. (Products stay well under 2^63 for any real
  host: 1e9 pages x 1e5 chars x 5 ~ 5e14.)

A page is flagged soft-404 when status==200 and either signal fires.

Scale shape: one narrow projection, one map-side-partial groupBy(host)
(the host stats relation is one row per host), joined back on host —
left to AQE, which broadcasts when the host set fits (it does at test
scale; a 40M-host Common-Crawl run correctly falls back to sort-merge
on the same key the groupBy already shuffled). The keyword scan is a
JVM-side `contains` over the already-read text column — no Python in
the loop, no second pass over the bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ptt_spider_go_spark.functions.columns import url_host

#: canonical not-found phrases, matched on the lower-cased body.
SOFT404_PHRASES = (
    "page not found",
    "404 not found",
    "error 404",
    "does not exist",
    "no longer available",
)


def kw_hits(text, phrases=SOFT404_PHRASES):
    """How many of `phrases` the lower-cased `text` column contains —
    JVM-side `contains` sums, shared with the host-level panel."""
    lowered = F.lower(text)
    kw = None
    for p in phrases:
        hit = F.contains(lowered, F.lit(p)).cast("int")
        kw = hit if kw is None else kw + hit
    return kw


def soft404_scores(pages: DataFrame, phrases=SOFT404_PHRASES) -> DataFrame:
    """(url, host, status, n_chars, kw_hits, tiny, soft404) for every
    page. `pages` needs (url, status, text); host is derived from url.
    """
    kw = kw_hits(F.col("text"), phrases)
    base = pages.select(
        "url",
        url_host(F.col("url")).alias("host"),
        F.col("status").cast("int").alias("status"),
        F.length("text").cast("bigint").alias("n_chars"),
        kw.alias("kw_hits"),
    )
    host_stats = (
        base.where(F.col("status") == 200)
        .groupBy("host")
        .agg(
            F.count("*").alias("_cnt"),
            F.sum("n_chars").alias("_total"),
        )
    )
    scored = base.join(host_stats, "host", "left")
    tiny = (
        (F.col("status") == 200)
        & (F.lit(5) * F.col("n_chars") * F.col("_cnt") < F.col("_total"))
    )
    return scored.select(
        "url", "host", "status", "n_chars", "kw_hits",
        tiny.alias("tiny"),
        ((F.col("status") == 200)
         & ((F.col("kw_hits") >= 1) | tiny)).alias("soft404"),
    )
