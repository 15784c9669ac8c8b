"""MIME sniffing from magic bytes — routing fetched payloads safely.

The reference fetches exactly two payload kinds and knows which is
which from the URL shape (board/article HTML via crawler.go, image
bytes via the download worker — parser_impl.go:92-110 collects image
hrefs only). A generic crawl cannot trust the URL *or* the server:
`Content-Type` famously lies (the reason WHATWG standardized MIME
sniffing, mimesniff.spec.whatwg.org) — servers label gzip as
text/html, PDFs as octet-stream, HTML error pages as image/png. A
pipeline that routes payloads by the declared type feeds binary into
the HTML parser and mojibake into the corpus; one that sniffs the
leading bytes routes correctly and gets a free corruption signal
(`mismatch` — declared family ≠ sniffed family — which quarantine
and host-quality gates consume alongside soft-404s).

Implemented as the spec's pattern-matching core over the `html:
binary` column, smallest-prefix-first:

- magic numbers: %PDF-, GIF87a/GIF89a, 89 50 4E 47 (PNG), FF D8 FF
  (JPEG), 1F 8B (gzip), 50 4B 03 04 (zip family), 00 01 00 00 /
  OTTO (fonts are the spec's list; omitted here — not crawl
  payloads), RIFF....WEBP.
- HTML detection: the spec's tag-scan — optional UTF-8 BOM +
  whitespace, then one of the case-insensitive tag openers
  (`<!DOCTYPE html`, `<html`, `<head`, `<body`, `<script`, ...,
  `<!--`) followed by space or `>`.
- binary-vs-text: any NUL in the first 512 bytes ⇒
  application/octet-stream, else text/plain.

All JVM built-ins — binary substring, hex, one bounded ISO-8859-1
decode of the 512-byte prefix (the spec's resource header), short
regexes. The payload is never decoded in full, never shuffled, and
crosses no Python boundary; pure projection, fuses into the scan
(the exact discipline of the charset sniffer next door, which runs
AFTER this one has routed the payload to the HTML lane).

Cited reference behavior: crawler.go routes by URL kind;
parser_impl.go:92-110 image collection — this operator is what makes
that routing safe when the server, not the crawler, names the type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: sniffed-mime -> coarse routing family
_FAMILY = {
    "text/html": "html",
    "text/plain": "text",
    "application/pdf": "document",
    "image/gif": "image",
    "image/png": "image",
    "image/jpeg": "image",
    "image/webp": "image",
    "application/gzip": "archive",
    "application/zip": "archive",
    "application/octet-stream": "binary",
}

_HTML_OPENERS = (
    "!doctype html", "html", "head", "body", "script", "iframe",
    "h1", "div", "font", "table", "a", "style", "title", "b", "br",
    "p", "!--",
)


def _family(mime):
    out = F.lit("binary")
    for m, fam in _FAMILY.items():
        out = F.when(mime == m, F.lit(fam)).otherwise(out)
    return F.when(mime.isNull(), F.lit(None).cast("string")) \
        .otherwise(out)


def sniff_mime(responses: DataFrame) -> DataFrame:
    """(url, mime, family, declared_family, mismatch) per response.
    `responses` needs (url, content_type: string nullable,
    html: binary). `mime` is the sniffed type; `mismatch` fires when
    a declared type exists and its family differs from the sniffed
    one (octet-stream declarations mismatch nothing — the spec treats
    them as 'no useful claim')."""
    hex2 = F.hex(F.expr("substring(html, 1, 2)"))
    hex3 = F.hex(F.expr("substring(html, 1, 3)"))
    hex4 = F.hex(F.expr("substring(html, 1, 4)"))
    head = F.decode(F.expr("substring(html, 1, 512)"), "ISO-8859-1")
    # spec's tag scan: optional UTF-8 BOM, optional whitespace, then a
    # known opener followed by whitespace or '>'
    openers = "|".join(o.replace("!--", "!\\-\\-") for o in _HTML_OPENERS)
    is_html = F.lower(head).rlike(
        r"^(\xef\xbb\xbf)?[ \t\n\r\x0c]*<(" + openers + r")[ \t\n\r\x0c>]")
    riff = F.hex(F.expr("substring(html, 1, 4)")) == "52494646"
    webp = riff & (F.hex(F.expr("substring(html, 9, 4)")) == "57454250")
    has_nul = F.instr(head, "\x00") > 0
    mime = (
        # a missing payload (failed fetch) sniffs as nothing — NULL,
        # never 'text/plain', and never a mismatch (pinned)
        F.when(F.col("html").isNull(), F.lit(None).cast("string"))
        .when(F.expr("substring(html, 1, 5)").cast("string") == "%PDF-",
              F.lit("application/pdf"))
        .when(F.expr("substring(html, 1, 6)").cast("string")
              .isin("GIF87a", "GIF89a"), F.lit("image/gif"))
        .when(hex4 == "89504E47", F.lit("image/png"))
        .when(hex3 == "FFD8FF", F.lit("image/jpeg"))
        .when(hex2 == "1F8B", F.lit("application/gzip"))
        .when(hex4 == "504B0304", F.lit("application/zip"))
        .when(webp, F.lit("image/webp"))
        .when(is_html, F.lit("text/html"))
        .when(has_nul, F.lit("application/octet-stream"))
        .otherwise(F.lit("text/plain"))
    )
    declared = F.lower(F.regexp_extract(
        F.coalesce(F.col("content_type"), F.lit("")),
        r"^\s*([a-zA-Z0-9.+\-]+/[a-zA-Z0-9.+\-]+)", 1))
    declared_family = (
        F.when(declared == "", F.lit(None).cast("string"))
        .when(declared == "application/octet-stream",
              F.lit(None).cast("string"))
        .when(declared.rlike("^text/html$|^application/xhtml"),
              F.lit("html"))
        # text-based application/* types (json, xml, javascript and
        # their +suffix forms) are the 'text' family: their bodies
        # correctly sniff as text/plain, and mapping them to 'binary'
        # would flag every healthy JSON/XML/JS response as corrupt
        .when(declared.rlike(r"^application/(json|xml|javascript|"
                             r"ecmascript)$|\+(json|xml)$"),
              F.lit("text"))
        .when(declared.startswith("text/"), F.lit("text"))
        .when(declared.startswith("image/"), F.lit("image"))
        .when(declared == "application/pdf", F.lit("document"))
        .when(declared.isin("application/gzip", "application/zip",
                            "application/x-gzip"), F.lit("archive"))
        .otherwise(F.lit("binary"))
    )
    fam = _family(mime)
    return responses.select(
        "url",
        mime.alias("mime"),
        fam.alias("family"),
        declared_family.alias("declared_family"),
        (declared_family.isNotNull() & fam.isNotNull()
         & (declared_family != fam))
        .alias("mismatch"),
    )
