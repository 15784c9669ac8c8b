"""Host-level quality gate: keep / review / drop whole domains.

Page-level filters (X10 quality, X75 soft-404, the dedup stack) miss
the cheapest and most effective cut real corpora make FIRST: entire
hosts that are overwhelmingly error stubs, mirrored duplicates or
empty shells get dropped wholesale (C4 removed whole domains;
RefinedWeb and Dolma rank hosts before reading their pages twice).
This operator rolls the page-level evidence into one verdict row per
host:

- `soft404_ppm`: soft-404 pages per million 200-responses (X75's
  flags aggregated) — a host answering "not found" with 200s at scale
  is broken, whatever its individual pages score.
- `dup_ppm`: duplicate-content pages per million 200s — (n_200 −
  distinct content hashes) over n_200; mirrors and session-id
  explosions collapse to few hashes.
- `avg_chars`: integer mean body length — empty-shell detector.

All rates are integer parts-per-million (`x * 1000000 // n` — no
floats, oracle bit-exact). Verdict: 'drop' when soft404_ppm >
DROP_SOFT404_PPM or dup_ppm > DROP_DUP_PPM (or the host has no 200s
at all), 'review' past half either threshold, else 'keep'.

Scale shape: one pass over the pages for the per-page projection
(status, length, phrase hits, content md5 — the text column is read
once and reduced to a hash immediately), ONE groupBy(host) with
map-side partial count/sum/approx-free exact distinct via a
(host, hash) pre-aggregation — the classic two-level exact
count-distinct that reduces instead of shuffling page text. The
output is one row per host: broadcastable back onto any frontier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ptt_spider_go_spark.functions.columns import url_host
from ptt_spider_go_spark.operators.soft404 import SOFT404_PHRASES, kw_hits

DROP_SOFT404_PPM = 200_000   # >20% soft 404s -> drop
DROP_DUP_PPM = 500_000       # >50% duplicate content -> drop


def host_quality_panel(pages: DataFrame,
                       phrases=SOFT404_PHRASES) -> DataFrame:
    """(host, n_pages, n_200, soft404_ppm, dup_ppm, avg_chars,
    verdict) per host. `pages` needs (url, status, text)."""
    base = pages.select(
        url_host(F.col("url")).alias("host"),
        F.col("status").cast("int").alias("status"),
        F.length("text").cast("bigint").alias("n_chars"),
        kw_hits(F.col("text"), phrases).alias("kw"),
        F.md5(F.col("text")).alias("hash"),
    )
    ok = F.col("status") == 200
    # host-mean length feeds the same tiny test X75 uses, host-local
    hs = base.groupBy("host").agg(
        F.count("*").alias("n_pages"),
        F.sum(ok.cast("bigint")).alias("n_200"),
        F.sum(F.when(ok, F.col("n_chars")).otherwise(0)).alias("_len200"),
    )
    flagged = (
        base.join(hs, "host")
        .select(
            "host", "status", "n_chars", "hash", "n_pages", "n_200",
            "_len200",
            (ok & ((F.col("kw") >= 1)
                   | (F.lit(5) * F.col("n_chars") * F.col("n_200")
                      < F.col("_len200")))).alias("_soft"),
        )
    )
    # two-level exact distinct: (host, hash) reduces before counting
    per_hash = flagged.where(ok).groupBy("host", "hash").agg(
        F.count("*").alias("_nh"),
        F.sum(F.col("_soft").cast("bigint")).alias("_sh"),
        F.sum("n_chars").alias("_ch"),
    )
    agg = per_hash.groupBy("host").agg(
        F.sum("_nh").alias("_n200"),
        F.count("*").alias("_ndistinct"),
        F.sum("_sh").alias("_nsoft"),
        F.sum("_ch").alias("_chars"),
    )
    totals = hs.join(agg, "host", "left")
    n200 = F.coalesce(F.col("_n200"), F.lit(0).cast("bigint"))
    # integer ppm: x * 1e6 div n — no floats anywhere
    soft_ppm = F.when(
        n200 > 0, F.expr("(_nsoft * 1000000L) div _n200"))
    dup_ppm = F.when(
        n200 > 0, F.expr("((_n200 - _ndistinct) * 1000000L) div _n200"))
    avg_chars = F.when(n200 > 0, F.expr("_chars div _n200"))
    verdict = (
        F.when(n200 == 0, F.lit("drop"))
        .when((soft_ppm > DROP_SOFT404_PPM) | (dup_ppm > DROP_DUP_PPM),
              F.lit("drop"))
        .when((soft_ppm > DROP_SOFT404_PPM // 2)
              | (dup_ppm > DROP_DUP_PPM // 2), F.lit("review"))
        .otherwise(F.lit("keep"))
    )
    return totals.select(
        "host", "n_pages",
        n200.alias("n_200"),
        soft_ppm.alias("soft404_ppm"),
        dup_ppm.alias("dup_ppm"),
        avg_chars.alias("avg_chars"),
        verdict.alias("verdict"),
    )
