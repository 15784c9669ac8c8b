"""Column-expression twins vs the pure-Python reference semantics.

Every scalar function exists twice: as a Catalyst column expression
(functions/columns.py, JVM-side) and as pure Python (htmlparse/, used
inside the Arrow UDFs). These tests pin both to the same outputs.
"""

import pytest
from pyspark.sql import functions as F

from ptt_spider_go_spark.functions import columns as C
from ptt_spider_go_spark.htmlparse import files as PF
from ptt_spider_go_spark.htmlparse import ptt as PP

PUSH_CASES = ["爆", "99", "X5", "XX", "X", "", "  爆 ", "abc", "X12", "-3", "5"]


def test_push_rate_decode_matches_python(spark):
    df = spark.createDataFrame([(s,) for s in PUSH_CASES], "s string")
    got = [r["v"] for r in df.select(C.push_rate_decode(F.col("s")).alias("v")).collect()]
    want = [PP.decode_push_rate(s) for s in PUSH_CASES]
    assert got == want


HREF_CASES = [
    "https://i.imgur.com/x.jpg",
    "//i.imgur.com/y.png",
    "http://example.com/z.gif",
    "https://imgur.com/abcd",
    "https://imgur.com/a/album",
    "https://example.com/doc.pdf",
    "http://imgur.com/noext",
    "https://x.test/photo.jpeg",
    "relative/path.png",
]


def test_normalize_img_href_matches_python(spark):
    df = spark.createDataFrame([(h,) for h in HREF_CASES], "h string")
    got = [r["v"] for r in df.select(C.normalize_img_href(F.col("h")).alias("v")).collect()]
    want = [PP.normalize_img_href(h) for h in HREF_CASES]
    assert got == want


URL_CASES = [
    "https://i.imgur.com/abc.jpg",
    "https://example.com/path/to/photo.png?w=100&h=50",
    "https://example.com/pic.gif#frag",
    "https://imgur.com/abcd",
    "https://example.com/noext",
]


def test_image_file_name_matches_python(spark):
    df = spark.createDataFrame([(u,) for u in URL_CASES], "u string")
    got = [r["v"] for r in df.select(C.image_file_name(F.col("u")).alias("v")).collect()]
    want = [PF.image_file_name(u) for u in URL_CASES]
    assert got == want


def test_clean_file_name_and_dir_key(spark):
    df = spark.createDataFrame([('a\\b/c:d*e?f"g<h>i|j', 7)], "t string, p int")
    row = df.select(
        C.clean_file_name(F.col("t")).alias("c"),
        C.dir_key(F.col("t"), F.col("p")).alias("k"),
    ).first()
    assert row["c"] == "abcdefghij"
    assert row["k"] == "abcdefghij_7"


def test_max_page_from_href(spark):
    df = spark.createDataFrame(
        [("/bbs/Beauty/index2345.html",), ("/bbs/B/indexabc.html",), ("nope",)],
        "h string",
    )
    got = [r["v"] for r in df.select(C.max_page_from_href(F.col("h")).alias("v")).collect()]
    assert got == [2346, None, None]


def test_final_title_semantics(spark):
    df = spark.createDataFrame(
        [("list", "parsed"), ("", "parsed"), ("list", ""), ("", "")],
        "lt string, pt string",
    )
    board = [
        r["v"]
        for r in df.select(C.final_title(F.col("lt"), F.col("pt"), False).alias("v")).collect()
    ]
    filem = [
        r["v"]
        for r in df.select(C.final_title(F.col("lt"), F.col("pt"), True).alias("v")).collect()
    ]
    # crawler.go:535-541: parsed wins iff (fileMode and parsed != "") or
    # (list == "" and parsed != "")
    assert board == ["list", "parsed", "list", ""]
    assert filem == ["parsed", "parsed", "list", ""]


@pytest.mark.parametrize(
    "attempt,ra,want",
    [
        (1, None, 1000),
        (2, None, 2000),
        (3, None, 4000),
        (6, None, 30000),   # cap
        (1, 5, 5000),       # Retry-After seconds
        (1, 60, 30000),     # Retry-After capped
        (1, 0, 1000),       # non-positive -> exponential
    ],
)
def test_retry_backoff_ms(spark, attempt, ra, want):
    df = spark.createDataFrame([(attempt, ra)], "attempt int, ra int")
    got = df.select(
        C.retry_backoff_ms(F.col("attempt"), F.col("ra")).alias("v")
    ).first()["v"]
    assert got == want


def test_display_name(spark):
    df = spark.createDataFrame([("t", "u"), ("", "u"), (None, "u")], "t string, u string")
    got = [r["v"] for r in df.select(C.display_name(F.col("t"), F.col("u")).alias("v")).collect()]
    assert got == ["t", "u", "u"]
