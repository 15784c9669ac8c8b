"""Charset sniffing over raw fetched HTML bytes.

The reference crawls one site that is uniformly UTF-8, so its parser
decodes unconditionally (crawler/parser.go works on already-decoded
strings). The open web is not so kind: a 100 TB WARC corpus mixes
UTF-8, legacy 8-bit codepages and UTF-16, and decoding with the wrong
charset silently mojibakes every downstream text operator. This is the
WHATWG encoding-sniffing precedence (html.spec.whatwg.org §13.2.3.2),
relational, over the `html: binary` column of the north-rule table:

1. **BOM** (authoritative, overrides everything): EF BB BF -> utf-8,
   FF FE -> utf-16le, FE FF -> utf-16be.
2. **Transport**: `charset=` parameter of the HTTP Content-Type.
3. **In-band**: a `charset=` in the first 1024 bytes, decoded as
   ISO-8859-1 (ASCII-compatible superset — the spec's prescan reads
   bytes, not characters) — catches both `<meta charset=x>` and the
   legacy `<meta http-equiv=Content-Type content="...; charset=x">`.
4. **Fallback**: windows-1252 (the spec's de-facto default for `en`).

Everything is JVM built-ins — substring on binary, hex, one
ISO-8859-1 decode of a bounded 1024-byte prefix, two regexes on short
strings. The html payload itself is never decoded, never shuffled,
and crosses no Python boundary; the operator is a pure projection
(zero shuffles), so it fuses into whatever scan feeds it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_CHARSET_RE = r"charset\s*=\s*[\"']?([a-z0-9_\-]+)"


def sniff_charset(responses: DataFrame) -> DataFrame:
    """(url, charset, source) for every fetched response. `responses`
    needs (url, content_type: string nullable, html: binary); charset
    is lowercase, source in {bom, http, meta, default}."""
    hex3 = F.hex(F.expr("substring(html, 1, 3)"))
    hex2 = F.hex(F.expr("substring(html, 1, 2)"))
    bom = (
        F.when(hex3 == "EFBBBF", F.lit("utf-8"))
        .when(hex2 == "FFFE", F.lit("utf-16le"))
        .when(hex2 == "FEFF", F.lit("utf-16be"))
    )
    http = F.regexp_extract(
        F.lower(F.coalesce(F.col("content_type"), F.lit(""))),
        _CHARSET_RE, 1)
    head = F.lower(F.decode(F.expr("substring(html, 1, 1024)"),
                            "ISO-8859-1"))
    meta = F.regexp_extract(head, r"<meta[^>]*" + _CHARSET_RE, 1)
    return responses.select(
        "url",
        F.coalesce(
            bom,
            F.when(http != "", http),
            F.when(meta != "", meta),
            F.lit("windows-1252"),
        ).alias("charset"),
        F.coalesce(
            F.when(bom.isNotNull(), F.lit("bom")),
            F.when(http != "", F.lit("http")),
            F.when(meta != "", F.lit("meta")),
            F.lit("default"),
        ).alias("source"),
    )
