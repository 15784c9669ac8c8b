"""Markdown document sink (S7).

Renders each article's README.md byte-exactly per the reference format
(markdown/generator_impl.go:40-54):

    # <title>\n\n
    - **文章網址**: [<url>](<url>)\n
    - **推文數量**: <push>\n\n
    ## 圖片列表\n\n
    ![<file>](./<file>)\n      (one per image, collision-suffixed names)

Rendering is a pure column expression (JVM-side, codegen) — the
filenames were already derived next to the image list in the content
parse UDF, mirroring how the reference shares fileutil.ImageFileNames
between crawler and markdown. Writing to a filesystem tree is optional
(`write_tree`, foreachPartition) — the table IS the deliverable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def markdown_content(title: Column, article_url: Column, push_count: Column,
                     file_names: Column) -> Column:
    header = F.format_string(
        "# %s\n\n- **文章網址**: [%s](%s)\n- **推文數量**: %d\n\n## 圖片列表\n\n",
        title, article_url, article_url, push_count,
    )
    imgs = F.array_join(
        F.transform(
            file_names, lambda f: F.format_string("![%s](./%s)\n", f, f)
        ),
        "",
    )
    return F.concat(header, F.coalesce(imgs, F.lit("")))


def markdown_docs(content_df: DataFrame) -> DataFrame:
    """article_content (+save_dir) -> markdown_docs(article_url, save_dir,
    content)."""
    return content_df.select(
        F.col("url").alias("article_url"),
        F.col("save_dir"),
        markdown_content(
            F.col("final_title"),
            F.col("url"),
            F.col("push_rate"),
            F.col("file_names"),
        ).alias("content"),
    )


def write_tree(docs: DataFrame, root: str) -> None:
    """Optional on-disk parity: one README.md per save_dir under `root`.
    Executor-side foreachPartition writer (no driver collect)."""
    def write_part(rows):
        import os

        for r in rows:
            d = os.path.join(root, r["save_dir"])
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, "README.md"), "w", encoding="utf-8") as f:
                f.write(r["content"])

    docs.foreachPartition(write_part)
