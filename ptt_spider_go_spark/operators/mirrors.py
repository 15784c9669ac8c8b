"""Mirror-host detection: host pairs serving the same content.

The reference crawls one site, so "the same article fetched twice"
can only happen via URL aliases — which its URL-seen set already
collapses (crawler.go:213-230's visited map, here D4). The open web
adds a failure mode the seen set cannot catch: DIFFERENT hosts
serving byte-identical pages (mirrors, CDN vanity domains, scraped
re-hosts, www/apex splits that escaped canonicalization). Crawl
pipelines detect these at the HOST level — compare the *sets of
content fingerprints* two hosts serve and flag pairs whose overlap is
too large to be coincidence (Bharat & Broder's classic mirror study;
modern corpora drop the smaller host wholesale). Catching a mirror
saves every future fetch against it, which is why this runs from the
same per-host rollup the quality gate (X82) uses.

Algorithm, all exact integer arithmetic:

1. profile: distinct (host, content-hash) pairs — each host becomes a
   set of md5s. One dedup shuffle on (host, hash).
2. hot-hash cut: a hash served by more than `hot_hash_cap` hosts is
   boilerplate (error stubs, parked-domain pages, empty shells) and
   is evidence of NOTHING about any particular pair — and it is also
   exactly the row that would make the self-join quadratic. Cut by
   df, the same move PPJoin/prefix filtering makes (X4): the
   pair-count upper bound drops to sum_h C(df_h <= cap, 2).
3. pair counts: profile ⋈ profile on hash with host_a < host_b, one
   groupBy(host_a, host_b) -> shared. Both sides are hash-partitioned
   by the join key already produced by step 2's groupBy — AQE reuses
   the exchange.
4. rates: containment_ppm = shared*1e6 // min(|A|,|B|) (the mirror
   test — a small host fully contained in a big one IS mirrored even
   though Jaccard is low) and jaccard_ppm over the union, both
   against per-host set sizes from a host-keyed rollup that is tiny
   (one row per host) and broadcast back onto the pairs.

Scale shape: no all-pairs join anywhere — pairs exist only where a
(sub-cap) hash witnesses them, the same bounded-fanout envelope the
MinHash band join (X2) rides. The hot-hash cut is the load-bearing
bound: with cap c, a hash contributes at most c(c-1)/2 pair rows.
Output is one row per *witnessed* host pair, broadcastable as a
drop-list into the frontier gate next to the blocklist (X72).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ptt_spider_go_spark.functions.columns import url_host

#: a hash on more hosts than this is boilerplate, not mirror evidence
HOT_HASH_CAP = 16
#: flag a pair as mirrors past this containment (parts per million)
MIRROR_CONTAINMENT_PPM = 600_000


def host_content_profile(pages: DataFrame) -> DataFrame:
    """Distinct (host, hash) content profile. `pages` needs (url,
    text); text is reduced to its md5 in the scan projection so page
    bodies never cross a shuffle."""
    return pages.select(
        url_host(F.col("url")).alias("host"),
        F.md5(F.col("text")).alias("hash"),
    ).distinct()


def mirror_pairs(pages: DataFrame,
                 hot_hash_cap: int = HOT_HASH_CAP,
                 containment_ppm: int = MIRROR_CONTAINMENT_PPM,
                 ) -> DataFrame:
    """(host_a, host_b, shared, n_a, n_b, containment_ppm,
    jaccard_ppm, is_mirror) for every host pair witnessed by at least
    one shared sub-cap content hash, host_a < host_b lexically."""
    prof = host_content_profile(pages)

    # per-host set sizes: one row per host -> broadcast back later.
    sizes = prof.groupBy("host").agg(F.count("*").alias("n_hashes"))

    # df per hash, then keep sub-cap hashes. groupBy(hash) and the
    # join back are co-partitioned on hash (exchange reuse).
    df_by_hash = prof.groupBy("hash").agg(F.count("*").alias("df"))
    kept = (
        prof.join(df_by_hash.filter(F.col("df") <= hot_hash_cap), "hash")
        .select("hash", "host")
    )

    a = kept.alias("a")
    b = kept.alias("b")
    pairs = (
        a.join(b, "hash")
        .filter(F.col("a.host") < F.col("b.host"))
        .groupBy(
            F.col("a.host").alias("host_a"),
            F.col("b.host").alias("host_b"),
        )
        .agg(F.count("*").alias("shared"))
    )

    sa = sizes.select(F.col("host").alias("host_a"),
                      F.col("n_hashes").alias("n_a"))
    sb = sizes.select(F.col("host").alias("host_b"),
                      F.col("n_hashes").alias("n_b"))
    out = (
        pairs.join(F.broadcast(sa), "host_a")
        .join(F.broadcast(sb), "host_b")
    )
    return out.select(
        "host_a", "host_b", "shared", "n_a", "n_b",
        F.expr("CAST(shared * 1000000L AS BIGINT) DIV "
               "CAST(least(n_a, n_b) AS BIGINT)")
        .alias("containment_ppm"),
        F.expr("CAST(shared * 1000000L AS BIGINT) DIV "
               "CAST(n_a + n_b - shared AS BIGINT)")
        .alias("jaccard_ppm"),
    ).withColumn(
        "is_mirror",
        F.col("containment_ppm") >= F.lit(containment_ppm),
    )
