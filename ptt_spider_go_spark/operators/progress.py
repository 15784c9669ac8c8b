"""Progress-event taxonomy (T7) + its counting aggregates (D5).

Reference: types/progress.go:8-15 defines six event types, emitted at
crawler.go:275-278 (crawler_done), :406-411 (page_parsed with
current/total page and per-page article count), :464-469
(article_parsed with the post-dedup image count), :776
(download_start), :733-737 (download_done, message = savePath), and
:679-685/:713-730 (download_fail — HTTP status / write error / the
50 MB size cap, constants.go:42).

The engine emits the same taxonomy as a TABLE derived from the
superstep outputs — no side channel — so the metrics aggregation
carries the reference's counting semantics (per-article image counts,
task-level done/failed) and is replayable and checkpoint-exact.

Download outcomes are simulated deterministically: a task's byte size
derives from md5(img_url) bounded to 64 MiB, and the reference's 50 MB
cap decides done vs fail (so ~22% of tasks exercise the fail path).
WorkerID's engine analogue is the salted politeness lane (SURVEY T6),
also md5-derived.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ptt_spider_go_spark.config import MAX_IMAGE_SIZE_BYTES

PROGRESS_SCHEMA = (
    "superstep int, event_type string, worker_id int, article_title string, "
    "image_count int, current_page int, total_pages int, message string"
)

_SIM_SIZE_BOUND = 64 * 1024 * 1024


def simulated_image_bytes(img_url: Column) -> Column:
    """Deterministic md5-derived byte size in [0, 64 MiB) — the stand-in
    for the downloaded body length the reference measures with
    io.LimitReader (crawler.go:707)."""
    h = F.conv(F.substring(F.md5(img_url), 1, 7), 16, 10).cast("long")
    return h % F.lit(_SIM_SIZE_BOUND).cast("long")


def _lane(img_url: Column, workers: int) -> Column:
    """WorkerID analogue: md5-derived salted lane (SURVEY T6)."""
    return (
        F.conv(F.substring(F.md5(img_url), 9, 6), 16, 10).cast("long")
        % F.lit(workers)
    ).cast("int")


def _null(t: str) -> Column:
    return F.lit(None).cast(t)


def progress_events(contents: DataFrame, tasks: DataFrame,
                    fetch_log: DataFrame, articles: DataFrame,
                    total_pages: int, workers: int = 10) -> DataFrame:
    """The six-type progress-event table.

    contents/tasks must carry `superstep`; fetch_log provides the index
    page fetches; articles provides the per-page article counts that the
    page_parsed message reports (crawler.go:410)."""
    # page_parsed: one per fetched index page. CurrentPage is the
    # newest-first iteration ordinal (crawler.go:365-380: i+1), i.e. the
    # rank of the page within its board by page_no desc.
    idx = fetch_log.filter(
        (F.col("kind") == "index") & (F.col("outcome") == "fetched")
    ).withColumn(
        "page_no",
        F.regexp_extract(F.col("url"), r"index([0-9]+)\.html$", 1).try_cast("int"),
    ).withColumn(
        "board", F.regexp_extract(F.col("url"), r"/bbs/([^/]+)/", 1)
    )
    per_page = articles.groupBy("src_url").agg(F.count("*").alias("n_articles"))
    ordinal = Window.partitionBy("board").orderBy(
        F.col("page_no").desc(), F.col("url").asc()
    )
    page_parsed = (
        idx.join(per_page, idx["url"] == per_page["src_url"], "left")
        .withColumn("current_page", F.row_number().over(ordinal))
        .select(
            "superstep",
            F.lit("page_parsed").alias("event_type"),
            _null("int").alias("worker_id"),
            _null("string").alias("article_title"),
            _null("int").alias("image_count"),
            F.col("current_page"),
            F.lit(total_pages).alias("total_pages"),
            F.format_string(
                "解析第 %d/%d 頁完成，共 %d 篇文章",
                F.col("current_page"), F.lit(total_pages),
                F.coalesce(F.col("n_articles"), F.lit(0)),
            ).alias("message"),
        )
    )

    # article_parsed: post-dedup image count (uniqueStrings ran in the
    # parse kernel, mirroring crawler.go:459-469).
    article_parsed = contents.select(
        "superstep",
        F.lit("article_parsed").alias("event_type"),
        _null("int").alias("worker_id"),
        F.col("final_title").alias("article_title"),
        F.size("img_urls").alias("image_count"),
        _null("int").alias("current_page"),
        _null("int").alias("total_pages"),
        F.format_string(
            "文章「%s」解析完成，發現 %d 張圖片",
            F.col("final_title"), F.size("img_urls"),
        ).alias("message"),
    )

    # download_*: start for every dispatched task; done/fail decided by
    # the simulated body size vs the 50 MB cap (crawler.go:720-730).
    t = tasks.withColumn("worker_id", _lane(F.col("img_url"), workers)) \
             .withColumn("n_bytes", simulated_image_bytes(F.col("img_url"))) \
             .withColumn(
                 "save_path",
                 F.concat_ws("/", F.col("save_dir"), F.col("file_name")))
    base = [
        "superstep", F.col("worker_id"),
        _null("string").alias("article_title"), _null("int").alias("image_count"),
        _null("int").alias("current_page"), _null("int").alias("total_pages"),
    ]
    download_start = t.select(
        base[0], F.lit("download_start").alias("event_type"), *base[1:],
        F.col("img_url").alias("message"),
    )
    ok = F.col("n_bytes") <= MAX_IMAGE_SIZE_BYTES
    download_done = t.filter(ok).select(
        base[0], F.lit("download_done").alias("event_type"), *base[1:],
        F.col("save_path").alias("message"),
    )
    download_fail = t.filter(~ok).select(
        base[0], F.lit("download_fail").alias("event_type"), *base[1:],
        F.format_string("超過大小上限: %s", F.col("save_path")).alias("message"),
    )

    spark = contents.sparkSession
    crawler_done = spark.createDataFrame(
        [(None, "crawler_done", None, None, None, None, None, "爬蟲完成")],
        PROGRESS_SCHEMA,
    )

    cols = ["superstep", "event_type", "worker_id", "article_title",
            "image_count", "current_page", "total_pages", "message"]
    out = page_parsed.select(cols)
    for df in (article_parsed, download_start, download_done, download_fail,
               crawler_done):
        out = out.unionByName(df.select(cols))
    return out


def progress_metrics(events: DataFrame) -> DataFrame:
    """D5 counting aggregates over the taxonomy, shaped like the fetch
    metrics table: (superstep, kind='event', outcome=event_type, n,
    backoff_ms_total=0)."""
    return events.groupBy("superstep", "event_type").agg(
        F.count("*").alias("n")
    ).select(
        "superstep",
        F.lit("event").alias("kind"),
        F.col("event_type").alias("outcome"),
        "n",
        F.lit(0).cast("long").alias("backoff_ms_total"),
    )
