"""End-to-end board-mode crawl vs the sequential golden model."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ptt_spider_go_spark.config import CrawlConfig
from ptt_spider_go_spark.datagen import pages_pandas
from ptt_spider_go_spark.plans.crawl import run_crawl

from .golden_model import golden_crawl

BOARD = "Beauty"
PAGES = 3
PUSH = 10


@pytest.fixture(scope="module")
def dataset():
    return pages_pandas(
        boards=(BOARD, "Gossiping"), pages_per_board=4, slots_per_page=8
    )


@pytest.fixture(scope="module")
def golden(dataset):
    return golden_crawl(dataset, BOARD, PAGES, PUSH)


@pytest.fixture(scope="module")
def result(spark, dataset):
    pages = spark.createDataFrame(dataset)
    cfg = CrawlConfig(board=BOARD, pages=PAGES, push_rate=PUSH,
                      host_salt=4, max_supersteps=6)
    return run_crawl(spark, pages, cfg, verify_text=True)


def test_articles_match_golden_in_order(result, golden):
    got = [
        (r["board"], r["page_no"], r["pos"], r["title"], r["url"],
         r["author"], r["push_rate"])
        for r in result.articles.collect()
    ]
    want = [
        (a["board"], a["page_no"], a["pos"], a["title"], a["url"],
         a["author"], a["push_rate"])
        for a in golden["articles"]
    ]
    assert got == want
    assert len(got) > 0


def test_seen_membership_matches(result, golden):
    got = {r["url"] for r in result.seen.collect()}
    assert got == golden["seen"]


def test_download_tasks_match(result, golden):
    got = {
        (r["article_url"], r["img_url"], r["save_dir"], r["file_name"], r["seq"])
        for r in result.download_tasks.collect()
    }
    want = {
        (t["article_url"], t["img_url"], t["save_dir"], t["file_name"], t["seq"])
        for t in golden["tasks"]
    }
    assert got == want
    assert len(got) > 0


def test_markdown_bytes_match(result, golden):
    got = {r["article_url"]: r["content"] for r in result.markdown_docs.collect()}
    want = {m["article_url"]: m["content"] for m in golden["markdowns"]}
    assert got == want


def test_save_dirs_match_collision_suffixes(result, golden):
    got = {r["url"]: r["save_dir"] for r in result.contents.collect()}
    want = {c["url"]: c["save_dir"] for c in golden["contents"]}
    assert got == want
    # the dataset is built to contain at least one dir collision
    assert any(d.rsplit("_", 1)[-1] == "2" for d in want.values())


def test_text_extraction_byte_identical(result):
    rows = result.contents.select("text_match").collect()
    assert len(rows) > 0
    assert all(r["text_match"] for r in rows)


def test_file_mode(spark, dataset, tmp_path):
    golden_all = golden_crawl(dataset, BOARD, PAGES, 0)
    urls = [c["url"] for c in golden_all["contents"]][:5]
    noise = [
        "   " + urls[0],                                 # kept after trim (dup of urls[0])
        "see https://www.ptt.cc/bbs/X/M.1.A.html mid",   # dropped: prefix only
        "https://evil.test/https://www.ptt.cc/bbs/",     # dropped
        "",                                              # dropped
    ]
    f = tmp_path / "urls.txt"
    f.write_text("\n".join(urls + noise))

    golden_fm = golden_crawl(dataset, BOARD, 0, 0, file_urls=urls + [noise[0]])
    cfg = CrawlConfig(board=BOARD, pages=1, push_rate=0, max_supersteps=4)
    res = run_crawl(spark, spark.createDataFrame(dataset), cfg,
                    file_urls_path=str(f))
    got = {r["url"]: r["final_title"] for r in res.contents.collect()}
    # file mode: the duplicate seeded URL must appear once (D4 seen-set)
    want = {}
    for c in golden_fm["contents"]:
        want.setdefault(c["url"], c["final_title"])
    assert got == want
    # parsed title wins in file mode (C10)
    assert all(t != "" for t in got.values())
