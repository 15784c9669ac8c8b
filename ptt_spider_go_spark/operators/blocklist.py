"""Domain-blocklist filtering for the URL frontier.

Production web corpora gate the frontier on curated domain blocklists
(the UT1/Blacklists-UT-Capitole adult/malware lists FineWeb and
RefinedWeb use, internal spam lists, per-run kill lists). The
semantics everyone implements is REGISTRABLE-DOMAIN SUFFIX match:
a pattern `ads.example` blocks `ads.example` itself and every
subdomain (`x.ads.example`, `a.b.ads.example`), while a bare
single-label pattern (`example`) matches nothing — you never block a
whole TLD by accident. The most specific (longest) matching pattern
wins attribution, ties broken lexicographically — total order, so
the match column is oracle-exact.

Scale shape (the reason this is an operator and not a `LIKE` chain):

- matching runs per DISTINCT host, not per URL: hosts are ~10^7 when
  URLs are ~10^10, so the suffix explosion (a host has at most
  label-count-1 candidate suffixes, typically 2-4) happens on the
  small relation, and the verdict joins back to the frontier on the
  host equi-key the frontier is already shuffled by for politeness;
- the blocklist itself broadcasts (UT1-scale lists are ~10^6-10^7
  short strings — well under the broadcast budget; a list that
  outgrows it degrades to an ordinary shuffled equi-join on the
  suffix key with no code change, because the hint is advisory);
- no regex, no LIKE '%…' scans: suffix generation is array ops on
  the split host, matching is a hash equi-join.

Reference parity: the reference crawls a single fixed host and needs
no blocklist (client.go pins ptt.cc); this is extension X65 —
frontier hygiene a Common-Crawl-scale deployment cannot run without.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def host_suffixes(host: Column) -> Column:
    """All label-suffixes of `host` with >= 2 labels (the candidate
    registrable domains), e.g. a.b.example -> [a.b.example,
    b.example]. A bare TLD pattern can therefore never match a
    multi-label host; single-label hosts yield just themselves, so an
    exact-host pattern still blocks them."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.array_join(F.slice(parts, i + 1, n - i), "."),
        ),
    ).otherwise(F.array(host))


def blocklist_filter(rows: DataFrame, blocklist: DataFrame,
                     host_col: str = "host") -> DataFrame:
    """Annotate `rows` with (blocked: boolean, matched_pattern:
    string|null) by registrable-domain suffix match of rows[host_col]
    against blocklist(pattern). Longest matching pattern wins
    attribution, ties lexicographic. See module docstring for the
    scale shape; callers drop or quarantine on `blocked` (the
    quarantine path composes with errors.py like every other gate).
    """
    hosts = rows.select(host_col).distinct()
    # length-prefixed pattern string: max() picks longest-then-lex.
    tagged = F.concat(
        F.lpad(F.length("pattern").cast("string"), 4, "0"),
        F.col("pattern"),
    )
    verdicts = (
        hosts
        .select(host_col,
                F.explode(host_suffixes(F.col(host_col))).alias("_sfx"))
        .join(F.broadcast(blocklist.select("pattern")),
              F.col("_sfx") == F.col("pattern"), "left")
        .groupBy(host_col)
        .agg(F.max(F.when(F.col("pattern").isNotNull(), tagged))
             .alias("_m"))
    )
    # left join: a null host (unparseable URL) can never equi-match its
    # verdict row, and a frontier gate must annotate, not drop, such
    # rows — they surface as blocked=false and fail later at fetch.
    return (
        rows.join(verdicts, host_col, "left")
        .withColumn("blocked", F.col("_m").isNotNull())
        .withColumn("matched_pattern", F.expr("substring(_m, 5)"))
        .drop("_m")
    )
