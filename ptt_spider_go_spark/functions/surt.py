"""SURT (Sort-friendly URI Reordering Transform) canonical keys.

The reference crawler keys its seen-set and save dirs on raw URLs —
fine for one host (crawler/crawler.go:214-231), wrong for a
10^10-URL open-web frontier where an index must cluster by site. SURT
is the web-archive community's answer (Internet Archive wayback /
Common Crawl CDX): reverse the host labels so the key sorts
site-major, then append path and a canonicalized query:

    http://www.Example.com/A/b?z=1&a=2  ->  com,example)/a/b?a=2&z=1

Canonicalization choices (each the wayback-cdx default, documented
because SURT has dialects):

- host lowercased; ONE leading `www` label (optionally digit-suffixed:
  www2.) stripped — mirror hosts collapse;
- labels reversed and comma-joined, `)` closes the authority;
- path (default `/`) and query lowercased — CDX keys are
  case-folded end to end;
- query split on `&`, empty params dropped, params sorted
  byte-lexicographically, rejoined — param order never splits a key;
  an empty query keeps no `?`.

Everything is JVM built-ins (split/reverse/array_sort/concat): zero
Python in the hot path, and the DuckDB oracle reproduces the key with
list_reverse/list_sort over the same parts.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def surt_host(host: Column) -> Column:
    """Lowercased, www-stripped, label-reversed comma-joined host."""
    h = F.regexp_replace(F.lower(host), r"^www\d*\.", "")
    return F.concat_ws(",", F.reverse(F.split(h, r"\.")))


def surt_query(query: Column) -> Column:
    """Canonical query: lowercase, split on &, drop empties, sort,
    rejoin. NULL/empty query -> empty string (no '?')."""
    parts = F.array_sort(
        F.filter(F.split(F.lower(query), "&"), lambda p: p != "")
    )
    return F.coalesce(F.array_join(parts, "&"), F.lit(""))


def surt_key(url: Column) -> Column:
    """Full SURT key for a URL column: `host_rev)/path[?sorted_query]`.

    Parsing goes through try_parse_url so unparseable URLs yield NULL
    host -> a NULL key the caller can quarantine, never a wrong key.
    """
    host = F.try_parse_url(url, F.lit("HOST"))
    path = F.lower(F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit("/")))
    path = F.when(path == "", F.lit("/")).otherwise(path)
    q = surt_query(F.try_parse_url(url, F.lit("QUERY")))
    return F.when(
        host.isNotNull(),
        F.concat(
            surt_host(host),
            F.lit(")"),
            path,
            F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
        ),
    )
