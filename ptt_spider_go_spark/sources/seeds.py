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
