"""Arrow-vectorized parse stages (SURVEY §2.4 — the only Python compute).

Two shapes:

- ``parse_articles_map``: a ``mapInPandas`` stage (1 board-index page ->
  N article rows, the UDTF shape of P1) — avoids an array<struct> +
  posexplode round-trip and keeps the emitted ``pos`` column exact.
- scalar ``pandas_udf``s for P2 (article content), P3 (max page) and P4
  (byte-identical text extraction).

All per-document work happens batch-at-a-time over Arrow; there is no
row-at-a-time Python UDF anywhere in the engine (BASELINE.json
input_hint: "no per-row Python").
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ptt_spider_go_spark.htmlparse.files import image_file_names, unique_in_order
from ptt_spider_go_spark.htmlparse.ptt import (
    extract_text,
    parse_article_content,
    parse_articles,
    parse_max_page,
)

# Output schema of the P1 mapInPandas stage. Input must carry at least
# (url, html); extra grouping columns (board, page_no, warc_ts) pass through.
ARTICLES_SCHEMA = StructType(
    [
        StructField("board", StringType()),
        StructField("page_no", IntegerType()),
        StructField("src_url", StringType()),
        StructField("pos", IntegerType()),
        StructField("title", StringType()),
        StructField("url", StringType()),
        StructField("author", StringType()),
        StructField("push_rate", IntegerType()),
    ]
)


def parse_articles_map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: board-index pages -> article rows (P1).

    Expects columns (board, page_no, url, html); emits ARTICLES_SCHEMA
    rows with `pos` = document order among emitted rows (SURVEY O2).
    """
    for pdf in batches:
        out = {k: [] for k in
               ("board", "page_no", "src_url", "pos", "title", "url", "author", "push_rate")}
        for board, page_no, src_url, html in zip(
            pdf["board"], pdf["page_no"], pdf["url"], pdf["html"]
        ):
            if html is None:
                continue  # F6: missing page = non-200, dropped
            for row in parse_articles(html):
                out["board"].append(board)
                out["page_no"].append(page_no)
                out["src_url"].append(src_url)
                out["pos"].append(row["pos"])
                out["title"].append(row["title"])
                out["url"].append(row["url"])
                out["author"].append(row["author"])
                out["push_rate"].append(row["push_rate"])
        yield pd.DataFrame(out)


CONTENT_STRUCT = StructType(
    [
        StructField("parsed_title", StringType()),
        StructField("img_urls", ArrayType(StringType())),
        StructField("file_names", ArrayType(StringType())),
    ]
)


@F.pandas_udf(CONTENT_STRUCT)
def parse_content_udf(html: pd.Series) -> pd.DataFrame:
    """P2 + D1 + D2 in one article-scoped pass: parse title/images, dedup
    images first-occurrence-in-order (crawler.go:460), derive collision-
    suffixed filenames (filename.go:31-49). Single-row scope -> no shuffle."""
    titles, urls_col, names_col = [], [], []
    for doc in html:
        if doc is None:
            titles.append(None)
            urls_col.append(None)
            names_col.append(None)
            continue
        title, imgs = parse_article_content(doc)
        imgs = unique_in_order(imgs)
        titles.append(title)
        urls_col.append(imgs)
        names_col.append(image_file_names(imgs))
    return pd.DataFrame(
        {"parsed_title": titles, "img_urls": urls_col, "file_names": names_col}
    )


@F.pandas_udf(IntegerType())
def parse_max_page_udf(html: pd.Series) -> pd.Series:
    """P3: board landing page -> newest index number + 1; NULL on failure
    (quarantine path)."""
    return pd.Series(
        [None if doc is None else parse_max_page(doc) for doc in html],
        dtype="Int32",
    )


@F.pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """P4: engine-side text extraction; compared byte-wise against the
    pages.text golden column in tests."""
    return pd.Series(
        [None if doc is None else extract_text(doc) for doc in html]
    )
