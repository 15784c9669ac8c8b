"""Takedown propagation: delete-list enforcement over the corpus.

The reference deletes nothing — its output directory only grows
(fileutil.go appends; re-runs skip already-downloaded files). A
production training corpus has the opposite legal shape: DMCA
takedowns, robots revocations, right-to-be-forgotten requests and
licensing changes arrive as DELETE LISTS that must propagate through
every derived table before the next training run (C4 shipped takedown
revisions; every serious corpus release documents a removal process).
This operator applies a rule list to the corpus and emits an
auditable verdict per document plus a per-rule match count (the
compliance receipt — a rule that matched nothing is evidence too,
and must appear with n_matched=0).

Rules are (kind, key) rows, three kinds, precedence url > host >
content_hash when several match one document:

- `url`: exact URL — the common single-page takedown.
- `host`: every page on the host — site-wide revocation (a robots
  Disallow:/ arriving after pages were already fetched).
- `content_hash`: md5 of the text — removes REHOSTED copies of the
  taken-down content, which a URL rule cannot reach (the takedown
  analogue of mirror detection X83).

Scale shape: the rule list is thousands of rows against billions of
documents, so every match is a broadcast hash join of the tiny rule
side onto a corpus projection (url / host / md5(text) — text reduces
to its hash in the scan and never shuffles); the verdict relation is
corpus-partitioned with NO shuffle of the corpus at all. The audit
count is one groupBy over the (rule, doc) match rows — bounded by
matches, not by the corpus. Tombstoned rows feed the latest-wins
snapshot merge (X73's tombstone column) so deletion survives
re-crawls: a fresh fetch of a taken-down URL merges AGAINST the
tombstone instead of resurrecting the content.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ptt_spider_go_spark.functions.columns import url_host

KINDS = ("url", "host", "content_hash")


def _keyed(docs: DataFrame) -> DataFrame:
    return docs.select(
        "url",
        url_host(F.col("url")).alias("_host"),
        F.md5(F.col("text")).alias("_hash"),
    )


def takedown_verdicts(docs: DataFrame, rules: DataFrame) -> DataFrame:
    """(url, deleted, reason) per document; reason is the highest-
    precedence matching rule kind (url > host > content_hash) or
    NULL when retained. `docs` needs (url, text); `rules` needs
    (kind, key) with kind in KINDS."""
    keyed = _keyed(docs)
    by = {k: F.broadcast(
        rules.filter(F.col("kind") == k)
        .select(F.col("key").alias(f"_k_{k}")).distinct())
        for k in KINDS}
    j = (
        keyed
        .join(by["url"], keyed["url"] == F.col("_k_url"), "left")
        .join(by["host"], F.col("_host") == F.col("_k_host"), "left")
        .join(by["content_hash"],
              F.col("_hash") == F.col("_k_content_hash"), "left")
    )
    reason = (
        F.when(F.col("_k_url").isNotNull(), F.lit("url"))
        .when(F.col("_k_host").isNotNull(), F.lit("host"))
        .when(F.col("_k_content_hash").isNotNull(),
              F.lit("content_hash"))
    )
    return j.select(
        "url",
        reason.isNotNull().alias("deleted"),
        reason.alias("reason"),
    )


def takedown_audit(docs: DataFrame, rules: DataFrame) -> DataFrame:
    """(kind, key, n_matched) per rule — the compliance receipt.
    Rules that matched nothing appear with n_matched=0. Counts are
    per-rule document matches regardless of precedence (a document
    two rules hit counts for both: each requester gets a truthful
    receipt)."""
    keyed = _keyed(docs)
    # one corpus scan: explode each document into its three probe
    # rows (a 3-way union would re-read the billion-row corpus once
    # per kind)
    probes = keyed.select(
        F.explode(F.array(
            F.struct(F.lit("url").alias("kind"),
                     F.col("url").alias("key")),
            F.struct(F.lit("host").alias("kind"),
                     F.col("_host").alias("key")),
            F.struct(F.lit("content_hash").alias("kind"),
                     F.col("_hash").alias("key")),
        )).alias("p")
    ).select("p.kind", "p.key")
    hits = (
        probes.join(F.broadcast(rules.select("kind", "key").distinct()),
                    ["kind", "key"])
        .groupBy("kind", "key")
        .agg(F.count("*").alias("n_matched"))
    )
    return (
        rules.select("kind", "key").distinct()
        .join(hits, ["kind", "key"], "left")
        .select("kind", "key",
                F.coalesce(F.col("n_matched"), F.lit(0).cast("bigint"))
                .alias("n_matched"))
    )


def retained(docs: DataFrame, rules: DataFrame) -> DataFrame:
    """The corpus minus every deleted document — the table the next
    pipeline stage reads. Same broadcast joins; corpus stays in its
    own partitioning."""
    verdicts = takedown_verdicts(docs, rules)
    keep = verdicts.filter(~F.col("deleted")).select("url")
    return docs.join(keep, "url", "left_semi")
