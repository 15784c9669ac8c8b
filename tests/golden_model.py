"""Sequential reference-semantics crawl simulation (the test oracle).

Replays the reference crawler's exact control flow single-threaded over
a pandas pages table: max-page probe -> index pages newest-first ->
per-page article order -> push filter -> content parse -> image dedup ->
dir registry with _2/_3 suffixes in processing order -> filenames ->
markdown bytes (markdown/generator_impl.go:40-54 format). The Spark
engine must reproduce these outputs exactly (modulo its documented
deterministic ordering, which equals sequential order here).
"""

from __future__ import annotations

import pandas as pd

from ptt_spider_go_spark.htmlparse.files import (
    clean_file_name,
    image_file_names,
    unique_in_order,
)
from ptt_spider_go_spark.htmlparse.ptt import (
    parse_article_content,
    parse_articles,
    parse_max_page,
)


def golden_crawl(pages_pd: pd.DataFrame, board: str, pages: int,
                 push_rate: int, file_urls: list[str] | None = None) -> dict:
    by_url = dict(zip(pages_pd["url"], pages_pd["html"]))
    file_mode = file_urls is not None

    articles = []  # emitted ArticleInfo rows in channel order
    if file_mode:
        for u in file_urls:
            u = u.strip()
            if u.startswith("https://www.ptt.cc/bbs/"):
                articles.append(
                    {"board": u.split("/bbs/")[1].split("/")[0], "page_no": 0,
                     "pos": 0, "title": "", "url": u, "author": None,
                     "push_rate": 0}
                )
    else:
        landing = by_url.get(f"https://www.ptt.cc/bbs/{board}/index.html")
        max_page = parse_max_page(landing)
        for page_no in range(max_page, max_page - pages, -1):
            if page_no < 1:
                break  # F7
            html = by_url.get(f"https://www.ptt.cc/bbs/{board}/index{page_no}.html")
            if html is None:
                continue  # non-200 page: log + continue
            for row in parse_articles(html):
                if row["push_rate"] >= push_rate:  # F1
                    articles.append({**row, "board": board, "page_no": page_no})

    used_dirs: dict[str, str] = {}  # dirName -> owner url (crawler.go:565-585)
    seen = set()
    contents, tasks, markdowns = [], [], []
    for a in articles:
        seen.add(a["url"])
        html = by_url.get(a["url"])
        if html is None:
            continue  # 404 path (crawler.go:519-523)
        parsed_title, imgs = parse_article_content(html)
        imgs = unique_in_order(imgs)  # D1 (crawler.go:460)
        title = a["title"]
        if (file_mode and parsed_title) or (title == "" and parsed_title):
            title = parsed_title  # C10
        dir_key = f"{clean_file_name(title)}_{a['push_rate']}"
        name = dir_key
        i = 2
        while name in used_dirs and used_dirs[name] != a["url"]:
            name = f"{dir_key}_{i}"
            i += 1
        used_dirs.setdefault(name, a["url"])
        save_dir = f"{a['board']}/{name}"
        names = image_file_names(imgs)  # D2
        contents.append(
            {**a, "parsed_title": parsed_title, "final_title": title,
             "img_urls": imgs, "file_names": names, "save_dir": save_dir}
        )
        for seq, (u, fn) in enumerate(zip(imgs, names)):
            tasks.append(
                {"article_url": a["url"], "img_url": u, "save_dir": save_dir,
                 "file_name": fn, "seq": seq}
            )
        md = (
            f"# {title}\n\n- **文章網址**: [{a['url']}]({a['url']})\n"
            f"- **推文數量**: {a['push_rate']}\n\n## 圖片列表\n\n"
            + "".join(f"![{fn}](./{fn})\n" for fn in names)
        )
        markdowns.append(
            {"article_url": a["url"], "save_dir": save_dir, "content": md}
        )

    # Index URLs are also "seen" (they were fetched).
    if not file_mode and landing is not None and max_page:
        for page_no in range(max_page, max_page - pages, -1):
            if page_no >= 1:
                seen.add(f"https://www.ptt.cc/bbs/{board}/index{page_no}.html")

    return {
        "articles": articles,
        "contents": contents,
        "tasks": tasks,
        "markdowns": markdowns,
        "seen": seen,
    }
