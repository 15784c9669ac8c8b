"""Freshness-driven recrawl scheduling over the fetch log.

A BFS crawl (the reference's mode, spider.go) visits each URL once; a
production crawler then RE-visits by content-change expectation: index
pages (which gain new links) on a short TTL, article pages (immutable
once posted) on a long one. This operator turns the fetch log into the
next recrawl frontier: rows whose age has passed their kind's TTL, with
an integer overdue count the frontier priority can sort on (most-stale
first — the standard freshness heuristic, cf. Cho & Garcia-Molina,
"Synchronizing a database to improve freshness", 2000).

Exactness: ages are computed in integer MICROSECONDS
(unix_micros / epoch_us — the session timezone is pinned UTC so the
NTZ cast is exact), TTLs converted to micros once; due-ness and
overdue_periods are integer comparisons/divisions, so the DuckDB
oracle matches bit-for-bit. (floor(a/b) on <2^53 BIGINTs equals a//b:
the IEEE quotient is correctly rounded and integer boundaries are
representable.)

Scale shape: one narrow projection over the fetch log (url, ts, kind),
one filter — no shuffle at all; the output feeds the same frontier
union/priority machinery as fresh discoveries (plans/crawl.py), where
the regular seen-set/politeness path takes over.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: default TTLs by kind_rank: board index pages (0) refresh weekly,
#: article pages (1) monthly — articles rarely change after posting.
DEFAULT_TTLS_S = {0: 7 * 86400, 1: 30 * 86400}


def recrawl_due(fetch_log: DataFrame, now_ts: str,
                ttls_s: dict[int, int] | None = None) -> DataFrame:
    """(url, kind_rank, age_s, overdue_periods): fetch-log rows whose
    age at `now_ts` (a fixed 'YYYY-MM-DD HH:MM:SS' UTC string — the
    scheduler never reads the wall clock, so runs are replayable) has
    passed their kind's TTL. `fetch_log` needs (url, fetched_at,
    kind_rank). A kind_rank absent from `ttls_s` has NO TTL and is
    deliberately never due (its ttl_us is NULL, the >= comparison is
    NULL, the filter drops it) — recrawl is opt-in per kind, matching
    how crawlers treat one-shot resources (robots files, media
    bytes)."""
    ttls_s = ttls_s or DEFAULT_TTLS_S
    t_us = F.unix_micros(F.col("fetched_at").cast("timestamp"))
    now_us = F.unix_micros(F.lit(now_ts).cast("timestamp"))
    ttl_us = None
    for k, v in sorted(ttls_s.items()):
        cond = F.when(F.col("kind_rank") == k, F.lit(v * 1_000_000))
        ttl_us = cond if ttl_us is None else ttl_us.when(
            F.col("kind_rank") == k, F.lit(v * 1_000_000)
        )
    age_us = (now_us - t_us).alias("age_us")
    x = fetch_log.select(
        "url", "kind_rank", age_us, ttl_us.cast("long").alias("ttl_us")
    )
    return (
        x.filter(F.col("age_us") >= F.col("ttl_us"))
        .select(
            "url", "kind_rank",
            F.floor(F.col("age_us") / F.lit(1_000_000))
            .cast("long").alias("age_s"),
            F.floor(F.col("age_us") / F.col("ttl_us"))
            .cast("long").alias("overdue_periods"),
        )
    )


# --- change detection between snapshots (X68, r5) ---------------------------

#: integer change-ratio scale (micro-units, the engine-wide idiom)
CHANGE_SCALE = 1_000_000


def snapshot_diff(prev: DataFrame, cur: DataFrame,
                  url_col: str = "url",
                  text_col: str = "text") -> DataFrame:
    """(url, status, prev_md5, cur_md5) with status in
    new | gone | changed | unchanged — the per-URL delta between two
    crawl snapshots, the evidence stream every freshness model
    consumes (Cho & Garcia-Molina's change observations).

    Scale shape: each side is first projected to (url, md5(text)) —
    the full-outer equi-join on url then shuffles two NARROW string
    relations; page text never moves. Content equality by md5 hex is
    the same exact-dedup key X1 uses (collision-free in practice, and
    identical in both engines, so the oracle is bit-exact)."""
    p = prev.select(F.col(url_col).alias("url"),
                    F.md5(F.col(text_col)).alias("prev_md5"))
    c = cur.select(F.col(url_col).alias("url"),
                   F.md5(F.col(text_col)).alias("cur_md5"))
    status = (
        F.when(F.col("prev_md5").isNull(), F.lit("new"))
        .when(F.col("cur_md5").isNull(), F.lit("gone"))
        .when(F.col("prev_md5") != F.col("cur_md5"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        p.join(c, "url", "full_outer")
        .select("url", status.alias("status"), "prev_md5", "cur_md5")
    )


def host_change_rates(diff: DataFrame) -> DataFrame:
    """Per-host roll-up of a snapshot_diff: revisit counts by status
    plus change_micro = changed * 10^6 DIV revisited (NULL when the
    host had no revisited URL — no evidence is not zero change). One
    narrow groupBy with map-side partial aggregation; all counts and
    the ratio are exact BIGINT."""
    from ptt_spider_go_spark.functions.columns import url_host

    agg = [
        F.sum(F.when(F.col("status") == s, 1).otherwise(0))
        .cast("long").alias(f"n_{s}")
        for s in ("new", "gone", "changed", "unchanged")
    ]
    x = diff.select(url_host(F.col("url")).alias("host"), "status")
    rates = x.groupBy("host").agg(*agg)
    revisited = F.col("n_changed") + F.col("n_unchanged")
    return rates.withColumn(
        "change_micro",
        F.when(
            revisited > 0,
            F.expr(f"n_changed * {CHANGE_SCALE} DIV "
                   f"(n_changed + n_unchanged)"),
        ).cast("long"),
    )


def adaptive_host_ttls(rates: DataFrame, base_ttl_s: int,
                       min_ttl_s: int, max_ttl_s: int) -> DataFrame:
    """(host, ttl_s): recrawl interval inversely proportional to the
    observed change ratio — a host whose pages all changed gets
    base_ttl_s, one where 1-in-10 changed gets 10x that, clamped to
    [min_ttl_s, max_ttl_s]; hosts with NO revisit evidence get
    max_ttl_s (explore slowly until data exists). Exact integers:
    ttl = clamp(base * 10^6 DIV max(change_micro, 1)). Complements
    recrawl_due's per-kind TTLs with a per-host multiplier table (the
    same (host, value) broadcast-override shape budget_gate takes)."""
    raw = F.expr(
        f"{base_ttl_s}L * {CHANGE_SCALE}L DIV greatest(change_micro, 1L)"
    )
    ttl = F.when(
        F.col("change_micro").isNull(), F.lit(max_ttl_s).cast("long")
    ).otherwise(
        F.greatest(F.lit(min_ttl_s).cast("long"),
                   F.least(F.lit(max_ttl_s).cast("long"),
                           raw.cast("long")))
    )
    return rates.select("host", ttl.alias("ttl_s"))


def sitemap_recrawl(entries: DataFrame, fetch_log: DataFrame) -> DataFrame:
    """(url, status, lastmod_ts, last_fetch, due): lastmod-driven
    freshness — the consumer the X59 sitemap source's `lastmod` column
    was parsed for. The sitemaps protocol lets a host DECLARE change
    times; trusting the declaration (and re-verifying on fetch) is far
    cheaper than probing on a TTL, so production schedulers drive
    recrawl from it whenever present and fall back to TTLs (X56/X68)
    otherwise.

    status: 'new' (never fetched), 'stale' (declared lastmod is newer
    than our last fetch), 'fresh' (we fetched at/after it), 'unknown'
    (fetched, but lastmod absent or unparseable — W3C datetime is a
    SHOULD, not a MUST); due = new | stale. try_cast handles the
    protocol's date-only and datetime forms identically in both
    engines; a malformed lastmod becomes 'unknown', never an error —
    sitemap content is remote input.

    Scale shape: one groupBy(url, max) collapses the fetch log, one
    equi-join on url; timestamps compare exactly (UTC-pinned session,
    no float time)."""
    e = (
        entries.filter(F.col("kind") == "url")
        .select(
            "url",
            F.expr("try_cast(lastmod AS timestamp)").alias("lastmod_ts"),
        )
    )
    f = fetch_log.groupBy("url").agg(
        F.max(F.col("fetched_at").cast("timestamp")).alias("last_fetch")
    )
    status = (
        F.when(F.col("last_fetch").isNull(), F.lit("new"))
        .when(F.col("lastmod_ts").isNull(), F.lit("unknown"))
        .when(F.col("lastmod_ts") > F.col("last_fetch"), F.lit("stale"))
        .otherwise(F.lit("fresh"))
    )
    return (
        e.join(f, "url", "left")
        .select("url", status.alias("status"), "lastmod_ts", "last_fetch",
                status.isin("new", "stale").alias("due"))
    )


def merge_snapshots(base: DataFrame, delta: DataFrame,
                    gone: DataFrame | None = None,
                    url_col: str = "url",
                    ts_col: str = "warc_ts") -> DataFrame:
    """Corpus upsert without a table format: latest-wins merge of a
    base snapshot and a fresh crawl delta, minus tombstones — the
    maintenance operation a recrawling corpus runs every cycle (the
    Iceberg MERGE of the north rule's table world, expressed as a
    plain exact aggregation so it runs on bare parquet too).

    Per URL the surviving row is max(struct(ts, src_rank, payload)):
    newest timestamp wins; an equal-timestamp tie goes to the DELTA
    (re-fetching at the same declared time means re-verification —
    the fresh observation is authoritative); payload fields only
    break never-reached ties, keeping the order total and the oracle
    exact. `gone` (e.g. snapshot_diff's status='gone' URLs) anti-joins
    away last, so a tombstone beats both sides.

    Scale shape: one unionByName (no shuffle), ONE groupBy(url) with
    map-side partial max — the struct max reduces instead of
    windowing, so hot URLs with many observations never sort — and
    one left-anti join. Schema-generic: every non-key column rides
    inside the struct and comes back out with its own name."""
    cols = [c for c in base.columns if c not in (url_col, ts_col)]
    tagged = (
        base.withColumn("_rank", F.lit(0))
        .unionByName(delta.withColumn("_rank", F.lit(1)))
    )
    m = tagged.groupBy(url_col).agg(
        F.max(F.struct(F.col(ts_col), F.col("_rank"),
                       *[F.col(c) for c in cols])).alias("_m")
    )
    out = m.select(
        url_col,
        F.col(f"_m.{ts_col}").alias(ts_col),
        *[F.col(f"_m.{c}").alias(c) for c in cols],
    )
    if gone is not None:
        out = out.join(gone.select(url_col), url_col, "left_anti")
    return out


def revalidation_plan(fetch_log: DataFrame) -> DataFrame:
    """(url, mode, validator): the conditional-request plan for the
    next visit to every URL in the fetch log — the bandwidth half of
    recrawl scheduling. The scheduler decides WHEN (recrawl_due /
    sitemap_recrawl / adaptive TTLs); this decides HOW: a 304 Not
    Modified costs headers, a 200 re-download costs the full body,
    and at 100 TB the difference is the crawl budget.

    Per RFC 9110 §13.1.2 a cached ETag is the preferred validator
    (If-None-Match), Last-Modified the fallback (If-Modified-Since),
    and with neither the fetch is unconditional. `fetch_log` needs
    (url, fetched_at, etag, last_modified) — validator columns
    nullable; empty strings are treated as absent (proxies love
    emitting `ETag: ""`). The newest observation per URL wins, ties
    broken inside the struct so the order is total and oracle-exact.

    Scale shape: ONE groupBy(url) with map-side partial struct-max
    (merge_snapshots' reduce-not-sort shape) + one projection."""
    clean = fetch_log.select(
        "url", "fetched_at",
        *[F.when(F.col(c) == "", None).otherwise(F.col(c)).alias(c)
          for c in ("etag", "last_modified")],
    )
    m = clean.groupBy("url").agg(
        F.max(F.struct("fetched_at", "etag", "last_modified")).alias("_m")
    )
    etag = F.col("_m.etag")
    lm = F.col("_m.last_modified")
    return m.select(
        "url",
        F.when(etag.isNotNull(), F.lit("if-none-match"))
        .when(lm.isNotNull(), F.lit("if-modified-since"))
        .otherwise(F.lit("unconditional")).alias("mode"),
        F.coalesce(etag, lm).alias("validator"),
    )


#: IMF-fixdate (RFC 9110 §5.6.7), the only HTTP date format senders
#: may generate; obs-date forms degrade to NULL -> the next rung.
#: Spark >= 3 rejects 'E' in PARSE patterns, so the (fixed-width,
#: informationally redundant) day-name prefix is stripped first.
_HTTP_DATE_FMT = "dd MMM yyyy HH:mm:ss 'GMT'"


def _http_date(col: F.Column) -> F.Column:
    bare = F.regexp_replace(col, r"^[A-Za-z]{3}, ", "")
    return F.try_to_timestamp(bare, F.lit(_HTTP_DATE_FMT))


def cache_freshness(fetch_log: DataFrame,
                    heuristic_cap_s: int = 86400,
                    heuristic_den: int = 10) -> DataFrame:
    """RFC 9111 §4.2 freshness lifetime per fetched URL (X92): how
    long the origin says a capture stays fresh — the declared-policy
    rung ABOVE sitemap lastmod (X72) and change-rate TTLs (X68) in
    the recrawl stack. The reference refetches nothing (one-shot BFS,
    spider.go); a continuous crawler that ignores Cache-Control
    re-downloads CDN-pinned assets and hammers origins that already
    said "fresh for a day".

    `fetch_log` needs (url, fetched_at, cache_control, expires,
    date_hdr, last_modified) — header columns nullable. Precedence
    (§4.2.1, shared-cache rules):

    1. no-store / no-cache directive        -> 0 (always stale)
    2. s-maxage=N  (shared caches outrank)  -> N
    3. max-age=N                            -> N
    4. Expires - Date (Date absent -> fetched_at); an UNPARSEABLE
       Expires (e.g. "0", the classic idiom) counts as already
       expired (§5.3)                        -> max(0, delta)
    5. heuristic (§4.2.2): (ref - Last-Modified)/heuristic_den,
       capped at heuristic_cap_s             -> min(cap, delta/10)
    6. nothing                               -> NULL lifetime (caller
       falls back to kind TTLs / change-rate TTLs)

    Output: url + (lifetime_s BIGINT, source STRING in {no-store,
    s-maxage, max-age, expires, heuristic} or NULL, next_fetch_at =
    fetched_at + lifetime) + the remaining input columns (so
    compositions like cache_recrawl_due stay join-free projections).
    Integer-exact: lifetimes derive from
    unix_micros subtraction and integer division, directive values by
    regexp over the lowercased header (token boundaries, optional
    quoting) — every branch is a JVM projection, zero shuffles, and
    the DuckDB oracle reruns the arithmetic bit-for-bit.
    """
    cc = F.lower(F.coalesce(F.col("cache_control"), F.lit("")))
    no_store = cc.rlike(r"(^|[,\s])no-(store|cache)($|[,;\s])")
    s_max = F.regexp_extract(cc, r'(^|[,\s])s-maxage\s*=\s*"?(\d+)', 2)
    max_age = F.regexp_extract(cc, r'(^|[,\s])max-age\s*=\s*"?(\d+)', 2)

    fetched_us = F.unix_micros(F.col("fetched_at").cast("timestamp"))
    date_ts = _http_date(F.col("date_hdr"))
    ref_us = F.coalesce(F.unix_micros(date_ts), fetched_us)
    exp_ts = _http_date(F.col("expires"))
    exp_life = F.greatest(
        F.lit(0).cast("long"),
        ((F.unix_micros(exp_ts) - ref_us) / F.lit(1_000_000))
        .cast("long"),
    )
    lm_us = F.unix_micros(_http_date(F.col("last_modified")))
    heur = F.least(
        F.lit(heuristic_cap_s).cast("long"),
        ((ref_us - lm_us) / F.lit(heuristic_den) / F.lit(1_000_000))
        .cast("long"),
    )

    lifetime = (
        F.when(no_store, F.lit(0).cast("long"))
        .when(s_max != "", s_max.cast("long"))
        .when(max_age != "", max_age.cast("long"))
        .when(
            F.col("expires").isNotNull(),
            F.coalesce(exp_life, F.lit(0).cast("long")),
        )
        .when(lm_us.isNotNull() & (ref_us >= lm_us), heur)
    )
    source = (
        F.when(no_store, F.lit("no-store"))
        .when(s_max != "", F.lit("s-maxage"))
        .when(max_age != "", F.lit("max-age"))
        .when(F.col("expires").isNotNull(), F.lit("expires"))
        .when(lm_us.isNotNull() & (ref_us >= lm_us), F.lit("heuristic"))
    )
    return fetch_log.select(
        "url",
        lifetime.alias("lifetime_s"),
        source.alias("source"),
        F.when(
            lifetime.isNotNull(),
            F.timestamp_add("SECOND", lifetime, F.col("fetched_at")),
        ).alias("next_fetch_at"),
        *[c for c in fetch_log.columns if c != "url"],
    )


def cache_recrawl_due(fetch_log: DataFrame, now_ts: str,
                      ttls_s: dict[int, int] | None = None) -> DataFrame:
    """recrawl_due with the origin's declared freshness taking
    precedence: rows whose cache_freshness lifetime is known are due
    when age >= lifetime; rows with no declared policy fall back to
    the kind-TTL schedule (recrawl_due). Same output contract
    (url, kind_rank, age_s, overdue_periods); a no-store row has
    lifetime 0 and is always due with overdue_periods capped to
    age_s (per-second periods, the natural degenerate reading).
    Composition stays two narrow projections + one filter each —
    no shuffle."""
    base = cache_freshness(fetch_log).drop("source", "next_fetch_at")
    t_us = F.unix_micros(F.col("fetched_at").cast("timestamp"))
    now_us = F.unix_micros(F.lit(now_ts).cast("timestamp"))
    age_us = now_us - t_us
    life_us = F.col("lifetime_s") * F.lit(1_000_000)
    declared = base.filter(F.col("lifetime_s").isNotNull()).select(
        "url", "kind_rank",
        (age_us / 1_000_000).cast("long").alias("age_s"),
        F.floor(age_us / F.greatest(life_us, F.lit(1_000_000)))
        .cast("long").alias("overdue_periods"),
        age_us.alias("_age_us"), life_us.alias("_life_us"),
    ).filter(F.col("_age_us") >= F.col("_life_us")) \
        .drop("_age_us", "_life_us")
    fallback = recrawl_due(
        base.filter(F.col("lifetime_s").isNull()).drop("lifetime_s"),
        now_ts, ttls_s,
    )
    return declared.unionByName(fallback)


def sitemap_coverage(entries: DataFrame, fetched: DataFrame) -> DataFrame:
    """(host, n_declared, n_fetched_declared, n_undeclared_fetched,
    coverage_ppm, fully_covered): per-host audit of sitemap DECLARED
    URLs against what the crawl actually HOLDS — the coverage receipt
    for the X59→frontier seeding path (the sitemaps protocol is a
    host's own statement of what should exist; the gap is either crawl
    debt or a stale sitemap, and the undeclared side is discovery the
    sitemap missed). Receipts-not-assurances, like X87/X106.

    - n_declared: distinct sitemap URLs for the host;
    - n_fetched_declared: declared ∩ fetched;
    - n_undeclared_fetched: fetched URLs the sitemap never declared;
    - coverage_ppm: fetched_declared·10^6 DIV declared (exact integer;
      NULL when the host declares nothing — a host reached only by
      discovery has no coverage CLAIM, not zero coverage);
    - fully_covered: declared > 0 and every declared URL fetched.

    Scale shape: two url-distinct projections, ONE full-outer join on
    url (both sides hash the same key), one groupBy(host) rollup with
    map-side partials; host-level output, broadcastable downstream."""
    from ptt_spider_go_spark.functions.columns import url_host

    dec = entries.select("url").distinct().withColumn("_d", F.lit(1))
    got = fetched.select("url").distinct().withColumn("_f", F.lit(1))
    j = dec.join(got, "url", "full_outer").select(
        url_host(F.col("url")).alias("host"),
        F.coalesce(F.col("_d"), F.lit(0)).alias("_d"),
        F.coalesce(F.col("_f"), F.lit(0)).alias("_f"),
    )
    agg = j.groupBy("host").agg(
        F.sum("_d").cast("long").alias("n_declared"),
        F.sum(F.col("_d") * F.col("_f")).cast("long")
        .alias("n_fetched_declared"),
        F.sum((1 - F.col("_d")) * F.col("_f")).cast("long")
        .alias("n_undeclared_fetched"),
    )
    return agg.select(
        "host", "n_declared", "n_fetched_declared", "n_undeclared_fetched",
        F.when(
            F.col("n_declared") > 0,
            F.expr("n_fetched_declared * 1000000 DIV n_declared"),
        ).cast("long").alias("coverage_ppm"),
        ((F.col("n_declared") > 0)
         & (F.col("n_fetched_declared") == F.col("n_declared")))
        .alias("fully_covered"),
    )
