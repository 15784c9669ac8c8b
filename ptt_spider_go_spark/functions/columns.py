"""Scalar crawl functions as Catalyst column expressions (SURVEY §2.3).

Everything here is JVM-side (whole-stage-codegen'd) — no Python in the
hot path. Each builder cites the reference function it reproduces; the
same semantics also exist in pure Python (htmlparse/) for use inside the
parse UDFs, and the two are cross-checked in tests.

Spark 4 runs with ANSI mode on, so all string->number conversions go
through try_cast (mirroring Go's explicit Atoi error handling).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PTT_BASE_URL = "https://www.ptt.cc"

_GO_INT = r"^[+-]?[0-9]+$"  # strconv.Atoi accepts sign + ASCII digits only


def _go_atoi(c: Column) -> Column:
    """Atoi twin: int value when the string parses Go-style, else NULL."""
    return F.when(c.rlike(_GO_INT), c.try_cast("int"))


def ws_trim(c: Column) -> Column:
    """Go strings.TrimSpace twin: strips the exact unicode.IsSpace set
    (F.trim strips only ' '; Java regex \\s is ASCII-only, silently
    missing U+3000 — the full-width space ubiquitous in PTT Chinese
    text — and U+00A0; ADVICE r2). The class is built from the same
    canonical GO_WHITESPACE the Python kernel strips, so the Catalyst
    path, the kernel, and Go agree character-for-character."""
    from ptt_spider_go_spark.htmlparse.ptt import GO_WHITESPACE

    cls = f"[{GO_WHITESPACE}]"
    return F.regexp_replace(c, f"^{cls}+|{cls}+$", "")


# --- C1: push-count decode (ptt/parser_impl.go:46-60) ----------------------

def push_rate_decode(s: Column) -> Column:
    """Decode a push marker (after trim): 爆→100, X<k>→-k (0 if the rest
    fails Atoi), else Atoi(s) with failure→0 (empty→0)."""
    t = ws_trim(s)
    rest = F.substring(t, 2, 1_000_000)
    return (
        F.when(t == "爆", F.lit(100))
        .when(t.startswith("X"), F.coalesce(-_go_atoi(rest), F.lit(0)))
        .otherwise(F.coalesce(_go_atoi(t), F.lit(0)))
    )


# --- C2: URL absolutization (parser_impl.go:64) ----------------------------

def absolutize_url(href: Column) -> Column:
    return F.concat(F.lit(PTT_BASE_URL), href)


# --- C3/C4: image href normalization (parser_impl.go:98-109) ---------------

def normalize_img_href(href: Column) -> Column:
    """Column-expression twin of htmlparse.ptt.normalize_img_href:
    the normalized image URL, or NULL when the href is not an image
    link. Exact reference branch order: scheme fixups only apply in the
    suffix branch; the imgur branch appends .jpg verbatim."""
    is_img_suffix = (
        href.endswith(".jpg")
        | href.endswith(".jpeg")
        | href.endswith(".png")
        | href.endswith(".gif")
    )
    suffix_branch = (
        F.when(href.startswith("//"), F.concat(F.lit("https:"), href))
        .when(
            href.startswith("http://"),
            F.concat(F.lit("https://"), F.substring(href, 8, 1_000_000)),
        )
        .otherwise(href)
    )
    return (
        F.when(is_img_suffix, suffix_branch)
        .when(
            href.contains("imgur.com/") & ~href.contains("imgur.com/a/"),
            F.concat(href, F.lit(".jpg")),
        )
        .otherwise(F.lit(None).cast("string"))
    )


# --- C5: filename from URL (internal/fileutil/filename.go:16-25) -----------

def image_file_name(url: Column) -> Column:
    """Last path segment of the URL path (query/fragment stripped);
    Go path.Base edge cases ("" -> ".", all-slashes -> "/"); imgur
    links without an extension get .jpg appended.

    Path extraction is regex-based rather than try_parse_url: Java URI
    parsing REJECTS inputs Go's url.Parse tolerates (e.g. a second '#'
    — found by the parity fuzzer), and the reference derives the name
    from whatever url.Parse returns."""
    stripped = F.regexp_replace(url, r"[?#].*$", "")
    path = F.regexp_replace(
        stripped, r"^([a-zA-Z][a-zA-Z0-9+.\-]*:)?//[^/]*", ""
    )
    trimmed = F.regexp_replace(path, "/+$", "")
    base = (
        F.when(path == "", F.lit("."))
        .when(trimmed == "", F.lit("/"))
        .otherwise(F.element_at(F.split(trimmed, "/"), -1))
    )
    needs_jpg = url.contains("imgur.com") & ~base.contains(".")
    return F.when(needs_jpg, F.concat(base, F.lit(".jpg"))).otherwise(base)


# --- C6: filename sanitization (crawler/crawler.go:36,640-642) --------------

def clean_file_name(name: Column) -> Column:
    return F.regexp_replace(name, '[\\\\/:*?"<>|]', "")


# --- C7: dir-name format + save dir (crawler/crawler.go:545-546) ------------

def dir_key(title: Column, push_rate: Column) -> Column:
    return F.format_string("%s_%d", clean_file_name(title), push_rate)


def save_dir(board: Column, dir_name: Column) -> Column:
    return F.concat_ws("/", board, dir_name)


# --- C8: max-page arithmetic (parser_impl.go:128-138) -----------------------

def max_page_from_href(href: Column) -> Column:
    """index<N>.html -> N + 1; NULL when unparsable (error path)."""
    n = F.regexp_extract(href, r"index([0-9]+)\.html$", 1)
    return F.when(n != "", n.try_cast("int") + F.lit(1)).otherwise(
        F.lit(None).cast("int")
    )


# --- C10: final-title choice (crawler/crawler.go:535-541) -------------------

def final_title(list_title: Column, parsed_title: Column, file_mode: bool) -> Column:
    parsed_nonempty = parsed_title.isNotNull() & (parsed_title != "")
    if file_mode:
        return F.when(parsed_nonempty, parsed_title).otherwise(list_title)
    return F.when((list_title == "") & parsed_nonempty, parsed_title).otherwise(
        list_title
    )


# --- C11: log-message choice (crawler/crawler.go:477-482) -------------------

def display_name(title: Column, url: Column) -> Column:
    return F.coalesce(F.nullif(title, F.lit("")), url)


# --- T2: retry backoff arithmetic (crawler/retry.go:57-93) ------------------

def retry_backoff_ms(attempt: Column, retry_after_s: Column | None = None) -> Column:
    """Backoff before retry `attempt` (1-based): Retry-After seconds when
    present and >0, capped at 30 000 ms; else 1000 * 2^(attempt-1) capped
    at 30 000 ms (constants/constants.go:32-38)."""
    expo = F.least(
        (F.lit(1000) * F.pow(F.lit(2.0), attempt.cast("double") - 1)).cast("long"),
        F.lit(30000).cast("long"),
    )
    if retry_after_s is None:
        return expo
    ra = F.when(
        retry_after_s.isNotNull() & (retry_after_s > 0),
        F.least(retry_after_s.cast("long") * 1000, F.lit(30000).cast("long")),
    )
    return F.coalesce(ra, expo)


#: RFC1123 GMT — the HTTP-date layout Go's http.ParseTime tries first and
#: the only one real servers emit (RFC 9110 §5.6.7 says new dates MUST be
#: in this format; RFC850/asctime are obsolete accept-only forms).
#: Spark's post-3.0 parser refuses day-of-week fields (EEE) in *parse*
#: patterns, so the weekday prefix is validated/stripped by regex and
#: the remainder parsed with this pattern.
HTTP_DATE_FMT = "dd MMM yyyy HH:mm:ss 'GMT'"
_HTTP_DATE_RE = r"^[A-Z][a-z]{2}, ([0-9]{2} [A-Z][a-z]{2} [0-9]{4} [0-9:]{8} GMT)$"


def _http_date(ra: Column) -> Column:
    """RFC1123-GMT parse -> timestamp, NULL when the string isn't one."""
    rest = F.regexp_extract(ra, _HTTP_DATE_RE, 1)
    return F.try_to_timestamp(F.nullif(rest, F.lit("")), F.lit(HTTP_DATE_FMT))


def retry_after_delay_ms(ra: Column, attempt: Column, now: Column) -> Column:
    """Full Retry-After header decode (crawler/retry.go:57-93):

    1. integer seconds (strconv.Atoi) and > 0 -> seconds*1000, capped at
       30 000 ms; an integer <= 0 falls through to the exponential branch
       (Go tries the date parse next, which fails on a digit string);
    2. HTTP-date (RFC1123 GMT) -> delay = date - now; expired dates
       (delay <= 0) floor to the 1000 ms initial delay; cap 30 000 ms;
    3. otherwise (absent / junk): exponential 1000 * 2^(attempt-1),
       capped at 30 000 ms.

    `now` is an explicit timestamp column — the simulation never reads
    the wall clock, so runs are deterministic and oracle-checkable.
    """
    sec = F.when(ra.rlike(_GO_INT), ra.try_cast("long"))
    t = _http_date(ra)
    date_ms_raw = (F.unix_seconds(t) - F.unix_seconds(now)) * 1000
    date_ms = F.when(date_ms_raw <= 0, F.lit(1000).cast("long")).otherwise(
        F.least(date_ms_raw, F.lit(30000).cast("long"))
    )
    expo = F.least(
        (F.lit(1000) * F.pow(F.lit(2.0), attempt.cast("double") - 1)).cast("long"),
        F.lit(30000).cast("long"),
    )
    return (
        F.when(sec.isNotNull() & (sec > 0),
               F.least(sec * 1000, F.lit(30000).cast("long")))
        .when(sec.isNull() & t.isNotNull(), date_ms)
        .otherwise(expo)
    )


# --- misc: host extraction (politeness grouping key) -------------------------

def url_host(url: Column) -> Column:
    return F.try_parse_url(url, F.lit("HOST"))


# --- URL canonicalization (frontier-dedup key normalization) ---------------

def _let(val: Column, body) -> Column:
    """Bind a computed Column ONCE and let `body` reference it cheaply.

    Catalyst has no let-binding at the Column-API level: every place a
    Python Column variable is referenced splices a full COPY of its
    expression tree into the plan, and each copy is re-evaluated per
    row. A chain of helpers that each reference their input a few
    times therefore multiplies into exponentially many copies of the
    innermost tree (measured: normalize_url_rfc3986 at ~1 ms/row —
    136 s for the sf0.1 bench query — purely from duplicated regex
    subtrees). A single-element `transform` gives the missing let: the
    array element is evaluated once per row and the lambda variable is
    a bound reference, so `body` can use it any number of times for
    free. NULL propagation is unchanged (array(NULL) -> body(NULL))."""
    return F.element_at(F.transform(F.array(val), body), 1)


def canonicalize_url(url: Column) -> Column:
    """Canonical frontier key for a URL — the normalization a web-scale
    crawler applies BEFORE the seen-set probe so that trivially-distinct
    spellings of one resource collapse to one frontier entry (RFC 3986
    §6.2.2-6.2.3 syntax-based normalization, the subset that is always
    semantics-preserving):

      1. fragment stripped ('#...' never reaches the server);
      2. scheme + HOST lowercased (the only case-insensitive parts per
         RFC 3986 §3.1/§3.2.2 — userinfo keeps its case: http://TOKEN@h/
         and http://token@h/ are different credentials and must stay
         distinct frontier keys);
      3. default port dropped (:80 for http, :443 for https), with
         userinfo and bracketed IPv6 hosts handled (':80$' on the
         host:port tail is unambiguous — reg-names cannot contain ':'
         and an IPv6 literal's colons sit inside '[...]');
      4. empty path normalized to '/' (http://h and http://h/ are the
         same request target).

    The reference has no canonicalizer (its URLs are produced, not
    discovered — crawler/crawler.go builds them from a template), so
    rule choice follows RFC 3986; path dot-segment and percent-encoding
    normalization are deliberately omitted (they require a parser, not
    a projection — and percent-case folding can change keys for servers
    that treat %2F specially). IPv6 zone-id ('%25eth0') literals keep
    the zone's case (lowercased along with the host hex — harmless:
    zone ids are local-interface names, never sent on the wire). Pure
    JVM-side regex projection; every regex is in the Java/RE2-shared
    subset, so the DuckDB oracle is value-exact.

    Evaluation shape: each derived part (fragment-stripped URL,
    authority head, lowered authority, path tail) is `_let`-bound so it
    evaluates once per row however many rules read it — callers may
    pass arbitrarily large input trees (the bench query feeds a 10-way
    CASE) and composed normalizers stack more rules on top."""
    return _let(F.regexp_replace(url, "#.*$", ""), _canon_of_no_frag)


def _canon_of_no_frag(no_frag: Column) -> Column:
    auth = F.regexp_extract(
        no_frag, "^([a-zA-Z][a-zA-Z0-9+.\\-]*://[^/?#]*)", 1)
    return _let(auth, lambda a: _canon_with_auth(no_frag, a))


def _canon_with_auth(no_frag: Column, auth: Column) -> Column:
    rest = F.substring(no_frag, F.length(auth) + 1, F.lit(1_000_000))
    # scheme://[userinfo@]hostport — lowercase scheme and hostport only.
    scheme = F.lower(
        F.regexp_extract(auth, "^([a-zA-Z][a-zA-Z0-9+.\\-]*)://", 1))
    authority = F.regexp_replace(auth, "^[a-zA-Z][a-zA-Z0-9+.\\-]*://", "")
    # greedy '.*@' -> userinfo runs to the LAST '@' (hosts cannot
    # contain '@'); '' when absent on both engines.
    userinfo = F.regexp_extract(authority, "^(.*@)", 1)
    hostport = F.lower(F.regexp_replace(authority, "^.*@", ""))
    hostport = (
        F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    low = F.when(auth == "", F.lit("")).otherwise(
        F.concat(scheme, F.lit("://"), userinfo, hostport))
    # empty path -> '/' (only when there IS an authority and no path/query)
    parts = F.struct(low.alias("low"), rest.alias("rest"))
    return _let(parts, lambda x: F.when(
        (auth != "") & (x["rest"] == ""), F.concat(x["low"], F.lit("/"))
    ).otherwise(F.concat(x["low"], x["rest"])))


# --- in-page href resolution (shared by canonical / pagination / hreflang) --

def resolve_href(url: Column, href: Column) -> Column:
    """Resolve an in-page href against its page URL with JVM string
    functions: absolute, scheme-relative, root-relative and
    directory-relative forms (dot-segments stay with the full DOM
    kernel, htmlparse/dom.py — this is the no-Python fast path).
    NULL href -> NULL. One shared implementation so a resolution fix
    lands once (extracted from htmlparse/canonical.py's inline copy
    after operators/pagination.py grew a second one)."""
    scheme = F.regexp_extract(url, r"^([a-z][a-z0-9+.\-]*):", 1)
    origin = F.regexp_extract(url, r"^(https?://[^/]+)", 1)
    # directory of the page url; a host-only url gets a '/' appended
    # so relative hrefs never eat the authority
    base_dir = F.when(
        url.rlike(r"^https?://[^/]+/"),
        F.regexp_replace(url, r"[^/]*$", ""),
    ).otherwise(F.concat(url, F.lit("/")))
    return (
        F.when(href.isNull(), F.lit(None).cast("string"))
        .when(href.rlike(r"^https?://"), href)
        .when(href.startswith("//"), F.concat(scheme, F.lit(":"), href))
        .when(href.startswith("/"), F.concat(origin, href))
        .otherwise(F.concat(base_dir, href))
    )


# --- RFC 3986 full syntax-based normalization (X96) -----------------------

def pct_normalize(s: Column) -> Column:
    """RFC 3986 §6.2.2.1-6.2.2.2 percent-encoding normalization, pure
    JVM-side: uppercase the hex digits of every percent-escape and
    DECODE escapes of unreserved characters (ALPHA / DIGIT / '-' / '.'
    / '_' / '~') — '%41' -> 'A', '%7e' -> '~' — while leaving every
    reserved or non-ASCII escape intact ('%2F' stays '%2F': decoding it
    would change which servers treat the path as one segment).
    Malformed escapes ('%G1', trailing '%') pass through byte-for-byte.

    Shape: split on '%', transform the tail segments (each one starts
    with the two chars that followed a '%'), re-join — one
    split+transform+array_join projection, no Python. The reference has
    no URL normalizer (crawler/crawler.go builds URLs from a template);
    rule choice follows RFC 3986 §6.2.2. The DuckDB oracle mirrors the
    split/transform shape with list_transform + from_hex."""
    return _let(F.split(s, "%", -1), _pct_of_parts)


def _pct_of_parts(parts: Column) -> Column:
    head = F.element_at(parts, 1)
    tail = F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0)))

    def fix(seg: Column) -> Column:
        h2 = F.substring(seg, 1, 2)
        rest = F.substring(seg, 3, 1_000_000)
        is_hex = h2.rlike("^[0-9A-Fa-f]{2}$")
        ch = F.char(F.conv(h2, 16, 10).cast("long"))
        # nested when: conv() must only run on hex-verified segments
        # (ANSI mode; '&' does not short-circuit inside one condition)
        return F.when(
            is_hex,
            F.when(ch.rlike("^[A-Za-z0-9._~-]$"), F.concat(ch, rest))
            .otherwise(F.concat(F.lit("%"), F.upper(h2), rest)),
        ).otherwise(F.concat(F.lit("%"), seg))

    return F.concat(head, F.array_join(F.transform(tail, fix), ""))


def remove_dot_segments(path: Column) -> Column:
    """RFC 3986 §5.2.4 remove_dot_segments for absolute paths (leading
    '/'), as ONE Catalyst `aggregate` fold over the split segments — no
    Python, no loop in the driver. Stack semantics: '.' is dropped,
    '..' pops (never below root), anything else (including the empty
    segment of '//') pushes; a trailing '.' or '..' leaves a trailing
    '/'. '/a/b/../c/./d' -> '/a/c/d', '/a/b/..' -> '/a/', leading
    '/../' collapses to '/'. Non-absolute or NULL input is returned
    unchanged (request-target paths in a frontier are always absolute).
    """
    return _let(path, _dots_of_path)


def _dots_of_path(path: Column) -> Column:
    segs = F.split(path, "/", -1)
    # drop the leading '' produced by the leading '/'
    rest = F.slice(segs, 2, F.greatest(F.size(segs) - 1, F.lit(0)))
    acc0 = F.struct(
        F.expr("CAST(array() AS ARRAY<STRING>)").alias("st"),
        F.lit(False).alias("tr"),
    )

    def step(acc: Column, s: Column) -> Column:
        st = acc["st"]
        return F.struct(
            F.when(s == ".", st)
            .when(s == "..",
                  F.slice(st, 1, F.greatest(F.size(st) - 1, F.lit(0))))
            .otherwise(F.concat(st, F.array(s)))
            .alias("st"),
            ((s == ".") | (s == "..")).alias("tr"),
        )

    def finish(acc: Column) -> Column:
        joined = F.array_join(acc["st"], "/")
        return F.when(
            acc["tr"] & (F.size(acc["st"]) > 0),
            F.concat(F.lit("/"), joined, F.lit("/")),
        ).otherwise(F.concat(F.lit("/"), joined))

    folded = F.aggregate(rest, acc0, step, finish)
    return F.when(path.rlike("^/"), folded).otherwise(path)


def normalize_url_rfc3986(url: Column) -> Column:
    """Full RFC 3986 syntax-based normalization for frontier keys: the
    canonicalize_url subset (§6.2.2.3/§6.2.3: fragment strip,
    scheme+host lowercase, default-port drop, empty path -> '/') PLUS
    the two rules canonicalize_url deliberately omits — percent-
    encoding normalization (§6.2.2.2, pct_normalize) on the path and
    query, and dot-segment removal (§5.2.4, remove_dot_segments) on
    the path. Together these collapse every syntax-only spelling of a
    resource to one URL-seen key, shrinking the frontier before the
    Bloom/cuckoo probe. Still a pure JVM projection.

    Each stage (canon, head, after, path) is `_let`-bound: without the
    bindings every stage splices full copies of all earlier stages'
    trees into the plan and the per-row cost grows multiplicatively
    down the chain (measured ~1 ms/row before; ~7 µs/row after)."""
    return _let(canonicalize_url(url), _rfc3986_of_canon)


def _rfc3986_of_canon(canon: Column) -> Column:
    head = F.regexp_extract(
        canon, "^([a-zA-Z][a-zA-Z0-9+.\\-]*://[^/?#]*)", 1)
    return _let(head, lambda h: _rfc3986_with_head(canon, h))


def _rfc3986_with_head(canon: Column, head: Column) -> Column:
    after = F.substring(canon, F.length(head) + 1, F.lit(1_000_000))
    return _let(after, lambda a: _rfc3986_with_after(canon, head, a))


def _rfc3986_with_after(canon: Column, head: Column, after: Column) -> Column:
    path = F.regexp_extract(after, "^([^?#]*)", 1)
    return _let(path, lambda p: _rfc3986_finish(canon, head, after, p))


def _rfc3986_finish(canon: Column, head: Column, after: Column,
                    path: Column) -> Column:
    qtail = F.substring(after, F.length(path) + 1, F.lit(1_000_000))
    norm_path = F.when(
        path == "", F.lit("")
    ).otherwise(remove_dot_segments(pct_normalize(path)))
    return F.when(head == "", pct_normalize(canon)).otherwise(
        F.concat(head, norm_path, pct_normalize(qtail)))
