"""Generic frontier discovery: the expansion half of a web-crawl
superstep over arbitrary hosts.

`plans/crawl.py` is the reference-parity loop — its link discovery is
the PTT board/article shape (spider.go's two page kinds), its URLs
are produced from templates. A Common-Crawl-style deployment also
needs the GENERAL expansion step: given the pages just fetched, which
URLs does the corpus not yet know about? That is a fixed four-stage
composition of operators this engine already ships, and this module
is that composition (each stage's own contract query stays its
bit-exact certificate; `discover_frontier` has its own composed
oracle, `discover_frontier` in the registry):

    1. outlink extraction  (X66, pipeline/anchors.outlinks_from_pages)
       — one column-pruned mapInPandas pass over (url, html);
    2. URL canonicalization (X27, functions/columns.canonicalize_url)
       — JVM projection; trivially-distinct spellings collapse BEFORE
       the seen-probe so the frontier key space is minimal;
    3. domain-blocklist gate (X65, operators/blocklist.blocklist_filter)
       — per-distinct-host suffix match, broadcast pattern list;
    4. seen-set anti-join   (J2/D4, operators/dedup.dedup_against_seen)
       — with Bloom/cuckoo shard sets when the caller passes them
       (run_crawl's table-backed filter state plugs in directly),
       plain left-anti otherwise.

Scale shape: stages 2-3 are projections + one broadcast join; the
only wide operations are the candidate `distinct()` (hash-keyed on
the canonical URL — exactly the key the anti-join shuffles on next,
so AQE reuses the partitioning) and the anti-join itself, whose input
the Bloom/cuckoo layers cut by orders of magnitude at scale (measured
in cuckoo_ab, BENCH_FULL.json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ptt_spider_go_spark.functions.columns import (
    canonicalize_url,
    normalize_url_rfc3986,
    url_host,
)
from ptt_spider_go_spark.operators.blocklist import blocklist_filter
from ptt_spider_go_spark.operators.dedup import (
    BloomShardSet,
    CuckooShardSet,
    dedup_against_seen,
)
from ptt_spider_go_spark.pipeline.anchors import outlinks_from_pages


def discover_frontier(pages: DataFrame, seen: DataFrame | None,
                      blocklist: DataFrame | None = None,
                      blooms: "BloomShardSet | None" = None,
                      cuckoos: "CuckooShardSet | None" = None,
                      url_col: str = "url",
                      html_col: str = "html",
                      honor_nofollow: bool = False,
                      full_normalize: bool = False) -> DataFrame:
    """pages(url, html) -> one `url` column of canonical, unblocked,
    never-seen outlink targets — the next superstep's raw frontier
    (priority/politeness ordering is the scheduler's job, not
    discovery's). See module docstring for the stage-by-stage shape.

    `honor_nofollow=True` (opt-in, default off — pinned outputs
    untouched) drops pages whose robots META declares nofollow (X84)
    BEFORE outlink extraction — cheaper than filtering edges, since
    it skips the mapInPandas pass for those pages entirely. Expects
    `html_col` to be a decoded string column (route binary payloads
    through the charset sniffer first).

    `full_normalize=True` (opt-in, default off — pinned outputs
    untouched) keys the frontier on normalize_url_rfc3986 (X96)
    instead of canonicalize_url: dot-segment spellings and
    percent-escape variants of one resource collapse to a single
    candidate BEFORE the distinct/anti-join, shrinking both. Off by
    default because percent-decoding unreserved escapes changes the
    literal request target the fetcher sends; turn it on when the
    corpus's servers are RFC 3986-conformant. Cost is a wash since the
    let-binding rewrite (~7 µs/row, same order as canonicalize_url)."""
    if honor_nofollow:
        from ptt_spider_go_spark.htmlparse.metarobots import robots_meta

        meta = robots_meta(pages.select(
            F.col(url_col).alias("url"), F.col(html_col).alias("html")))
        follow = meta.filter(~F.col("nofollow")) \
            .select(F.col("url").alias(url_col))
        pages = pages.join(follow, url_col, "left_semi")
    keyfn = normalize_url_rfc3986 if full_normalize else canonicalize_url
    cand = (
        outlinks_from_pages(pages, url_col=url_col, html_col=html_col)
        .select(keyfn(F.col("url")).alias("url"))
        .distinct()
    )
    if blocklist is not None:
        cand = (
            blocklist_filter(
                cand.withColumn("_host", url_host(F.col("url"))),
                blocklist, host_col="_host",
            )
            .filter(~F.col("blocked"))
            .select("url")
        )
    return dedup_against_seen(cand, seen, blooms, cuckoos)


def discover_funnel(pages: DataFrame, seen: DataFrame | None,
                    blocklist: DataFrame | None = None,
                    url_col: str = "url",
                    html_col: str = "html",
                    full_normalize: bool = False) -> DataFrame:
    """(stage_no, stage, n_urls): per-stage attrition through the
    discovery chain — the DISCOVERY twin of crawl_gate_funnel's
    quality attrition (X89) and the corpus funnel's X43 pattern:

      0 outlinks   raw extracted edges (pre-collapse link mass);
      1 canonical  distinct frontier keys after canonicalization —
                   the gap to stage 0 is what normalization saves;
      2 unblocked  keys surviving the domain blocklist;
      3 novel      keys the seen set does not already hold — what the
                   superstep actually enqueues.

    The report a crawl operator reads to see WHERE candidate volume
    goes (and whether a normalization or blocklist change actually
    moved admission). Zero-seeded: every stage reports, 0 included.

    Scale shape: ONE mapInPandas extraction pass — the canonical-key
    groupBy yields the raw edge mass (sum of per-key multiplicities)
    and the distinct set together, so the html is never re-read per
    stage; blocklist verdicts join per DISTINCT host (broadcast);
    the seen flag is a left join on the same url key the groupBy
    hashed (AQE reuses the partitioning); counts aggregate BY STAGE
    KEY (tagged-struct explode, map-side partials — the graph_stats
    shape, no single-partition global funnel)."""
    keyfn = normalize_url_rfc3986 if full_normalize else canonicalize_url
    grp = (
        outlinks_from_pages(pages, url_col=url_col, html_col=html_col)
        .select(keyfn(F.col("url")).alias("url"))
        .groupBy("url")
        .agg(F.count("*").alias("_n_refs"))
    )
    if blocklist is not None:
        grp = (
            blocklist_filter(
                grp.withColumn("_host", url_host(F.col("url"))),
                blocklist, host_col="_host",
            )
            .withColumn("_blocked", F.coalesce(F.col("blocked"), F.lit(False)))
            .select("url", "_n_refs", "_blocked")
        )
    else:
        grp = grp.withColumn("_blocked", F.lit(False))
    if seen is not None:
        marker = seen.select(F.col("url")).distinct().withColumn(
            "_seen", F.lit(True))
        grp = grp.join(marker, "url", "left").withColumn(
            "_seen", F.coalesce(F.col("_seen"), F.lit(False)))
    else:
        grp = grp.withColumn("_seen", F.lit(False))

    one = F.lit(1).cast("long")
    zero = F.lit(0).cast("long")
    contrib = grp.select(F.explode(F.array(
        F.struct(F.lit(0).alias("stage_no"), F.lit("outlinks").alias("stage"),
                 F.col("_n_refs").cast("long").alias("n")),
        F.struct(F.lit(1).alias("stage_no"), F.lit("canonical").alias("stage"),
                 one.alias("n")),
        F.struct(F.lit(2).alias("stage_no"), F.lit("unblocked").alias("stage"),
                 F.when(~F.col("_blocked"), one).otherwise(zero).alias("n")),
        F.struct(F.lit(3).alias("stage_no"), F.lit("novel").alias("stage"),
                 F.when(~F.col("_blocked") & ~F.col("_seen"), one)
                 .otherwise(zero).alias("n")),
    )).alias("c")).select("c.*")
    counts = contrib.groupBy("stage_no", "stage").agg(
        F.sum("n").alias("n_urls"))
    seed = pages.sparkSession.createDataFrame(
        [(0, "outlinks"), (1, "canonical"), (2, "unblocked"), (3, "novel")],
        "stage_no int, stage string",
    )
    return seed.join(counts, ["stage_no", "stage"], "left").select(
        "stage_no", "stage",
        F.coalesce(F.col("n_urls"), F.lit(0).cast("long")).alias("n_urls"),
    )
