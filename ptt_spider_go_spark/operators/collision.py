"""Global dir-name collision suffixing (D3) as a deterministic window.

Reference: crawler/crawler.go:565-585 — a mutex-serialized registry maps
dirName -> owning article URL; a second article arriving with the same
"<cleanTitle>_<pushRate>" key gets `_2`, `_3`, ... in processing order.
That order is goroutine-arrival order, i.e. nondeterministic in the
reference itself (SURVEY §7 hard part 1). The engine defines the
canonical total order = frontier priority order
(page_no desc, pos asc, url asc), which reproduces the reference's own
sequential test cases exactly and makes replay/resume deterministic.

One shuffle on dir_key; dir keys are many and small, so no skew concern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ptt_spider_go_spark.functions.columns import dir_key, save_dir


def with_unique_dir(articles: DataFrame, board_col: str = "board",
                    title_col: str = "final_title",
                    push_col: str = "push_rate") -> DataFrame:
    """Append `dir_name` (suffixed on collision) and `save_dir` columns.

    Input must carry the priority columns (page_no, pos, url). Same
    (title, push) key -> first article in priority order keeps the bare
    key; later ones get `<key>_2`, `<key>_3`, ... (crawler.go:577-584).
    """
    key = dir_key(F.col(title_col), F.col(push_col))
    w = (
        Window.partitionBy(board_col, "dir_key0")
        .orderBy(F.col("page_no").desc(), F.col("pos").asc(), F.col("url").asc())
    )
    out = (
        articles.withColumn("dir_key0", key)
        .withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "dir_name",
            F.when(F.col("_rn") == 1, F.col("dir_key0")).otherwise(
                F.format_string("%s_%d", F.col("dir_key0"), F.col("_rn"))
            ),
        )
        .withColumn("save_dir", save_dir(F.col(board_col), F.col("dir_name")))
        .drop("dir_key0", "_rn")
    )
    return out
