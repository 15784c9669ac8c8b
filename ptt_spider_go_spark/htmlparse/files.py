"""Filename derivation + per-article collision suffixing.

Pure-Python port of the reference semantics (validated against the
reference's own test expectations):

- ``image_file_name``  <- /root/reference/internal/fileutil/filename.go:16-25
- ``image_file_names`` <- /root/reference/internal/fileutil/filename.go:31-49
- ``clean_file_name``  <- /root/reference/crawler/crawler.go:36,640-642

These run inside the article-content pandas UDF over one article's image
array (single-row scope, deterministic — SURVEY D2), never per-row at the
Spark level.
"""

from __future__ import annotations

import re
from urllib.parse import urlparse

# crawler.go:36 — strip path-hostile characters from titles.
_INVALID_CHARS = re.compile(r'[\\/:*?"<>|]')


def clean_file_name(name: str) -> str:
    return _INVALID_CHARS.sub("", name)


def _path_base(p: str) -> str:
    """Go ``path.Base``: last segment; "" and "/" -> "/" or "."; trailing
    slashes trimmed. Only the cases reachable from URL paths matter here."""
    if p == "":
        return "."
    p = p.rstrip("/")
    if p == "":
        return "/"
    return p.rsplit("/", 1)[-1]


def image_file_name(img_url: str) -> str:
    """Last path segment of the URL (query/fragment stripped); imgur links
    without an extension get ``.jpg`` appended (filename.go:16-25)."""
    name = _path_base(img_url)
    try:
        parsed = urlparse(img_url)
        name = _path_base(parsed.path)
    except ValueError:
        pass
    if "imgur.com" in img_url and "." not in name:
        name += ".jpg"
    return name


def image_file_names(img_urls: list[str]) -> list[str]:
    """Collision-suffixed local filenames, 1:1 with the input order.

    When two URLs derive the same base name, later ones get ``_2``, ``_3``…
    inserted before the extension, skipping names already taken — e.g. a
    pre-existing ``a_2.jpg`` forces the second ``a.jpg`` to ``a_3.jpg``
    (filename.go:31-49; filename_test.go:55-98).
    """
    names: list[str] = []
    taken: set[str] = set()
    for u in img_urls:
        base = image_file_name(u)
        dot = base.rfind(".")
        # Go path.Ext: suffix from the final dot in the final element.
        if dot >= 0:
            stem, ext = base[:dot], base[dot:]
        else:
            stem, ext = base, ""
        name = base
        i = 2
        while name in taken:
            name = f"{stem}_{i}{ext}"
            i += 1
        taken.add(name)
        names.append(name)
    return names


def unique_in_order(items: list[str]) -> list[str]:
    """First-occurrence order-preserving dedup (crawler.go:645-656)."""
    seen: set[str] = set()
    out: list[str] = []
    for it in items:
        if it not in seen:
            seen.add(it)
            out.append(it)
    return out
