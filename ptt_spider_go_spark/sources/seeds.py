"""Frontier seeding (S1/S2/S3).

Board mode: probe the board landing page for the newest index number
(S2, P3), then seed index-page URLs newest-first, never below index1
(F7 page-underflow guard, crawler.go:374-379). The page range expands
JVM-side via sequence+explode, so seeding N boards × P pages never
materializes on the driver.

File mode: read a text file of URLs, trim, keep lines *starting with*
https://www.ptt.cc/bbs/ (strict prefix, crawler.go:811-812), push_rate
filled 0 (crawler.go:820).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ptt_spider_go_spark.functions.udfs import parse_max_page_udf
from ptt_spider_go_spark.htmlparse.ptt import PTT_BASE_URL

PTT_BBS_PREFIX = "https://www.ptt.cc/bbs/"

FRONTIER_COLS = [
    "url", "kind", "kind_rank", "board", "page_no", "pos", "depth",
    "warc_ts", "title", "author", "push_rate", "attempt", "backoff_ms",
]


def probe_max_pages(pages: DataFrame, boards: list[str]) -> dict[str, int]:
    """S2: fetch each board's landing page from the pages table and parse
    the newest index number. One tiny filtered scan + Arrow UDF."""
    landing_urls = [f"{PTT_BASE_URL}/bbs/{b}/index.html" for b in boards]
    rows = (
        pages.filter(F.col("url").isin(landing_urls))
        .select("url", parse_max_page_udf(F.col("html")).alias("max_page"))
        .collect()
    )
    out = {}
    for r in rows:
        board = r["url"].split("/bbs/")[1].split("/")[0]
        out[board] = r["max_page"]
    return out


def probe_max_pages_from_urls(pages: DataFrame, boards: list[str]) -> dict[str, int]:
    """S2 alternative (SURVEY S2: "max(page_no) aggregate over known
    index pages"): derive each board's newest index number from the url
    column alone — a column-pruned scan that never touches html bytes.
    Equivalent to the landing-page parse on any complete snapshot: the
    landing button points one below the newest index page present."""
    pat = r"/bbs/([^/]+)/index([0-9]+)\.html$"
    rows = (
        pages.select("url")
        .filter(F.col("url").rlike(pat))
        .select(
            F.regexp_extract("url", pat, 1).alias("board"),
            F.regexp_extract("url", pat, 2).cast("int").alias("page_no"),
        )
        .filter(F.col("board").isin(boards))
        .groupBy("board")
        .agg(F.max("page_no").alias("max_page"))
        .collect()
    )
    return {r["board"]: r["max_page"] for r in rows}


def board_frontier(spark: SparkSession, max_pages: dict[str, int],
                   pages_to_crawl: int) -> DataFrame:
    """S1/O1: index-page frontier, pages newest-first per board, stopping
    above index1 (F7)."""
    seed = spark.createDataFrame(
        [(b, int(mp)) for b, mp in max_pages.items() if mp],
        "board string, max_page int",
    )
    return (
        seed.select(
            "board",
            F.explode(
                F.sequence(
                    F.greatest(
                        F.col("max_page") - F.lit(pages_to_crawl - 1), F.lit(1)
                    ),
                    F.col("max_page"),
                )
            ).alias("page_no"),
        )
        .select(
            F.concat(
                F.lit(PTT_BASE_URL + "/bbs/"), F.col("board"),
                F.lit("/index"), F.col("page_no").cast("string"), F.lit(".html"),
            ).alias("url"),
            F.lit("index").alias("kind"),
            F.lit(0).alias("kind_rank"),
            "board",
            "page_no",
            F.lit(0).alias("pos"),
            F.lit(1).alias("depth"),
            F.lit(None).cast("timestamp").alias("warc_ts"),
            F.lit(None).cast("string").alias("title"),
            F.lit(None).cast("string").alias("author"),
            F.lit(0).alias("push_rate"),
            F.lit(1).alias("attempt"),
            F.lit(0).cast("long").alias("backoff_ms"),
        )
    )


def sitemap_frontier(pages: DataFrame, max_rounds: int = 3) -> DataFrame:
    """Frontier rows discovered through the robots->sitemap chain
    (X59/X60 composed into the crawl, VERDICT r04 next-round #4b):
    robots.txt pages in the snapshot -> their `Sitemap:` directives ->
    fetch the sitemap XML bodies from the same pages table -> flatten
    `<urlset>` page entries into frontier rows, recursing through
    `<sitemapindex>` entries up to `max_rounds` levels (the protocol
    nests one level in practice; the bound keeps a hostile index from
    looping).

    URL classification mirrors the two seed shapes the crawl already
    has: board index URLs become kind='index' rows (page_no extracted,
    so priority ordering treats them exactly like board_frontier
    seeds), article URLs become kind='article' rows with the file-mode
    defaults (title '' -> parsed title wins, push_rate 0 — the sitemap
    carries neither, crawler.go:820 parity). Non-PTT-shaped URLs are
    dropped (the same strict-prefix stance as file mode,
    crawler.go:811-812).

    Scale shape: the sitemap-url relation is tiny (one row per sitemap
    FILE, each holding up to 50k entries) -> broadcast joins against
    the pages scan; entries explode JVM-side; per-round frames are
    localCheckpointed so the bounded recursion never compounds lineage.
    """
    from ptt_spider_go_spark.sources.robots import sitemap_directives
    from ptt_spider_go_spark.sources.sitemap import sitemap_entries

    spark = pages.sparkSession
    robots = pages.filter(
        F.try_parse_url(F.col("url"), F.lit("PATH")) == "/robots.txt"
    ).select(
        F.try_parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.col("text").alias("body"),
    )
    todo = (
        sitemap_directives(robots)
        .select(F.col("sitemap_url").alias("url"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    fetched = _empty_urls(spark)
    page_urls = _empty_urls(spark)
    for _ in range(max_rounds):
        if todo.isEmpty():
            break
        bodies = pages.join(F.broadcast(todo), on="url").select(
            F.col("text").alias("xml")
        )
        entries = sitemap_entries(bodies).localCheckpoint(eager=True)
        page_urls = page_urls.unionByName(
            entries.filter(F.col("kind") == "page").select("url")
        )
        fetched = fetched.unionByName(todo)
        todo = (
            entries.filter(F.col("kind") == "sitemap")
            .select("url")
            .distinct()
            .join(fetched, on="url", how="left_anti")
            .localCheckpoint(eager=True)
        )

    idx_pat = r"^https://www\.ptt\.cc/bbs/([^/]+)/index([0-9]+)\.html$"
    u = page_urls.distinct()
    idx = u.filter(F.col("url").rlike(idx_pat)).select(
        "url",
        F.lit("index").alias("kind"),
        F.lit(0).alias("kind_rank"),
        F.regexp_extract("url", idx_pat, 1).alias("board"),
        F.regexp_extract("url", idx_pat, 2).cast("int").alias("page_no"),
        F.lit(0).alias("pos"),
        F.lit(1).alias("depth"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("string").alias("title"),
        F.lit(None).cast("string").alias("author"),
        F.lit(0).alias("push_rate"),
        F.lit(1).alias("attempt"),
        F.lit(0).cast("long").alias("backoff_ms"),
    )
    art = (
        u.filter(
            F.col("url").startswith(PTT_BBS_PREFIX)
            & ~F.col("url").rlike(idx_pat)
        )
        .select(
            "url",
            F.lit("article").alias("kind"),
            F.lit(1).alias("kind_rank"),
            F.regexp_extract(F.col("url"), r"/bbs/([^/]+)/", 1).alias("board"),
            F.lit(0).alias("page_no"),
            F.lit(0).alias("pos"),
            F.lit(2).alias("depth"),
            F.lit(None).cast("timestamp").alias("warc_ts"),
            F.lit("").alias("title"),  # list title unknown -> parsed wins
            F.lit(None).cast("string").alias("author"),
            F.lit(0).alias("push_rate"),
            F.lit(1).alias("attempt"),
            F.lit(0).cast("long").alias("backoff_ms"),
        )
    )
    return idx.unionByName(art)


def _empty_urls(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], "url string")


def file_frontier(spark: SparkSession, path: str) -> DataFrame:
    """S3/F5: file-mode article seeding. Lines trim ALL whitespace
    (strings.TrimSpace parity, crawler.go:812 — not space-only trim)."""
    from ptt_spider_go_spark.functions.columns import ws_trim

    lines = spark.read.text(path).select(ws_trim(F.col("value")).alias("line"))
    urls = lines.filter(F.col("line").startswith(PTT_BBS_PREFIX))
    return urls.select(
        F.col("line").alias("url"),
        F.lit("article").alias("kind"),
        F.lit(1).alias("kind_rank"),
        F.regexp_extract(F.col("line"), r"/bbs/([^/]+)/", 1).alias("board"),
        F.lit(0).alias("page_no"),
        F.lit(0).alias("pos"),
        F.lit(2).alias("depth"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit("").alias("title"),       # list title unknown -> parsed wins (C10)
        F.lit(None).cast("string").alias("author"),
        F.lit(0).alias("push_rate"),    # crawler.go:820
        F.lit(1).alias("attempt"),
        F.lit(0).cast("long").alias("backoff_ms"),
    )
