"""Freshness recrawl scheduler (operators/recrawl.py). (Spark-vs-DuckDB
parity additionally enforced on `recrawl_due` by the driver contract.)
"""

from pyspark.sql import functions as F

from ptt_spider_go_spark.operators import recrawl


def _due(spark, rows, now, ttls=None):
    log = spark.createDataFrame(
        rows, "url string, fetched_at timestamp, kind_rank int"
    )
    return {
        r["url"]: (r["age_s"], r["overdue_periods"])
        for r in recrawl.recrawl_due(log, now, ttls).collect()
    }


def test_ttl_boundaries_exact(spark):
    """Due-ness is an exact >= at microsecond resolution: one second
    short of the TTL is not due, the exact TTL instant is."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        ("u_exact", base, 0),                                  # age == 7d
        ("u_short", base + dt.timedelta(seconds=1), 0),        # 1s short
        ("u_old", base - dt.timedelta(days=21), 0),            # 28d -> 4 periods
        ("a_fresh", base, 1),                                  # 7d < 30d TTL
        ("a_due", base - dt.timedelta(days=23), 1),            # 30d exactly
    ]
    got = _due(spark, rows, "2024-01-08 00:00:00")
    assert got["u_exact"] == (7 * 86400, 1)
    assert "u_short" not in got
    assert got["u_old"] == (28 * 86400, 4)
    assert "a_fresh" not in got
    assert got["a_due"] == (30 * 86400, 1)


def test_custom_ttls_and_no_shuffle_shape(spark):
    import datetime as dt

    rows = [("u1", dt.datetime(2024, 1, 1), 0),
            ("u2", dt.datetime(2024, 1, 1), 1)]
    got = _due(spark, rows, "2024-01-02 00:00:00", {0: 3600, 1: 7 * 86400})
    assert got["u1"] == (86400, 24)
    assert "u2" not in got
    # narrow plan: no Exchange at all (pure projection + filter)
    log = spark.createDataFrame(
        rows, "url string, fetched_at timestamp, kind_rank int"
    )
    plan = recrawl.recrawl_due(log, "2024-01-02 00:00:00")._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_ngram_counts_hand_case(spark):
    from ptt_spider_go_spark.pipeline import textstats

    docs = spark.createDataFrame(
        [(i, "a b a b", "en") for i in range(6)],
        "doc_id long, text string, lang string",
    )
    rows = {(r["n"], r["gram"]): (r["cnt"], r["rank"])
            for r in textstats.ngram_counts(docs, min_count=5).collect()}
    # unigrams: a x12, b x12 -> tie ranks alphabetical
    assert rows[(1, "a")] == (12, 1) and rows[(1, "b")] == (12, 2)
    # bigrams: 'a b' x12, 'b a' x6
    assert rows[(2, "a b")] == (12, 1) and rows[(2, "b a")] == (6, 2)
    # trigrams: 'a b a' x6, 'b a b' x6 -> alphabetical tie
    assert rows[(3, "a b a")] == (6, 1) and rows[(3, "b a b")] == (6, 2)
    # min_count prunes: nothing below 5 appears
    assert all(c >= 5 for c, _ in rows.values())


def test_trap_suspects_rules_and_order(spark):
    from ptt_spider_go_spark.operators.politeness import trap_suspects

    urls = [
        ("https://a.example/x/y",),                           # clean
        ("https://a.example/" + "/".join(f"d{i}" for i in range(13)),),
        ("https://a.example/a/b/a/b/a/b",),                   # repeats
        ("https://a.example/p?" + "&".join(f"k{i}=1" for i in range(9)),),
        ("https://a.example/p?x=" + "z" * 520,),              # long
        # depth AND repeats both fire -> reason = first rule
        ("https://a.example/" + "/".join(["r"] * 14),),
    ]
    f = spark.createDataFrame(urls, "url string")
    got = {r["url"]: (r["is_trap"], r["reason"])
           for r in trap_suspects(f).collect()}
    assert got[urls[0][0]] == (False, None)
    assert got[urls[1][0]] == (True, "path_depth")
    assert got[urls[2][0]] == (True, "repeated_segments")
    assert got[urls[3][0]] == (True, "param_explosion")
    assert got[urls[4][0]] == (True, "url_length")
    assert got[urls[5][0]] == (True, "path_depth")  # fixed rule order


# --- snapshot diff + adaptive TTLs (r5) -------------------------------------


def test_snapshot_diff_statuses(spark):
    from ptt_spider_go_spark.operators import recrawl

    prev = spark.createDataFrame(
        [("http://a.example/1", "same"),
         ("http://a.example/2", "old"),
         ("http://a.example/3", "bye")],
        "url string, text string",
    )
    cur = spark.createDataFrame(
        [("http://a.example/1", "same"),
         ("http://a.example/2", "NEW TEXT"),
         ("http://a.example/4", "hello")],
        "url string, text string",
    )
    got = {r["url"]: r["status"]
           for r in recrawl.snapshot_diff(prev, cur).collect()}
    assert got == {
        "http://a.example/1": "unchanged",
        "http://a.example/2": "changed",
        "http://a.example/3": "gone",
        "http://a.example/4": "new",
    }


def test_host_change_rates_and_ttls(spark):
    """hot: 2/2 changed -> base TTL; cold: 0/2 changed -> max TTL;
    half: 1/2 -> 2x base; fresh host (new only) -> NULL rate, max."""
    from ptt_spider_go_spark.operators import recrawl

    rows = [
        ("http://hot.example/a", "changed"),
        ("http://hot.example/b", "changed"),
        ("http://cold.example/a", "unchanged"),
        ("http://cold.example/b", "unchanged"),
        ("http://half.example/a", "changed"),
        ("http://half.example/b", "unchanged"),
        ("http://fresh.example/a", "new"),
    ]
    diff = spark.createDataFrame(
        [(u, s, None, None) for u, s in rows],
        "url string, status string, prev_md5 string, cur_md5 string",
    )
    rates = recrawl.host_change_rates(diff)
    got = {r["host"]: r["change_micro"] for r in rates.collect()}
    assert got == {"hot.example": 1_000_000, "cold.example": 0,
                   "half.example": 500_000, "fresh.example": None}
    ttls = {
        r["host"]: r["ttl_s"]
        for r in recrawl.adaptive_host_ttls(
            rates, base_ttl_s=100, min_ttl_s=50, max_ttl_s=1000
        ).collect()
    }
    # hot: 100*1e6/1e6 = 100; cold: change 0 -> greatest(0,1)=1 ->
    # 1e8 clamped to 1000; half: 200; fresh: NULL -> max.
    assert ttls == {"hot.example": 100, "cold.example": 1000,
                    "half.example": 200, "fresh.example": 1000}


def test_sitemap_recrawl_statuses(spark):
    """new / stale / fresh / unknown(absent) / unknown(malformed);
    equality is fresh (fetched AT the declared time = verified); the
    fetch log collapses to max(fetched_at) per url."""
    from ptt_spider_go_spark.operators import recrawl

    entries = spark.createDataFrame(
        [
            ("url", "u_new", "2026-08-15"),
            ("url", "u_stale", "2026-08-15"),
            ("url", "u_fresh", "2026-08-01"),
            ("url", "u_eq", "2026-08-10"),
            ("url", "u_nolm", None),
            ("url", "u_bad", "next tuesday"),
            ("sitemap", "nested.xml", "2026-08-15"),  # not a page entry
        ],
        "kind string, url string, lastmod string",
    )
    fetch = spark.createDataFrame(
        [
            ("u_stale", "2026-08-10 00:00:00"),
            ("u_stale", "2026-08-01 00:00:00"),  # older row: max wins
            ("u_fresh", "2026-08-10 00:00:00"),
            ("u_eq", "2026-08-10 00:00:00"),
            ("u_nolm", "2026-08-10 00:00:00"),
            ("u_bad", "2026-08-10 00:00:00"),
        ],
        "url string, fetched_at string",
    )
    got = {r["url"]: (r["status"], r["due"])
           for r in recrawl.sitemap_recrawl(entries, fetch).collect()}
    assert got == {
        "u_new": ("new", True),
        "u_stale": ("stale", True),
        "u_fresh": ("fresh", False),
        "u_eq": ("fresh", False),
        "u_nolm": ("unknown", False),
        "u_bad": ("unknown", False),
    }


def test_merge_snapshots_semantics(spark):
    """Newest ts wins; same-ts tie goes to the delta; base-only and
    delta-only rows survive; tombstone beats both sides."""
    from ptt_spider_go_spark.operators import recrawl

    base = spark.createDataFrame(
        [("u1", "2026-08-01 00:00:00", "old1"),
         ("u2", "2026-08-05 00:00:00", "newer-in-base"),
         ("u3", "2026-08-01 00:00:00", "tie-base"),
         ("u4", "2026-08-01 00:00:00", "only-base"),
         ("u5", "2026-08-01 00:00:00", "doomed")],
        "url string, warc_ts string, text string",
    ).withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
    delta = spark.createDataFrame(
        [("u1", "2026-08-20 00:00:00", "new1"),
         ("u2", "2026-08-02 00:00:00", "older-in-delta"),
         ("u3", "2026-08-01 00:00:00", "tie-delta"),
         ("u6", "2026-08-20 00:00:00", "only-delta"),
         ("u5", "2026-08-20 00:00:00", "doomed-too")],
        "url string, warc_ts string, text string",
    ).withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
    gone = spark.createDataFrame([("u5",)], "url string")
    got = {r["url"]: r["text"]
           for r in recrawl.merge_snapshots(base, delta, gone=gone)
           .collect()}
    assert got == {
        "u1": "new1",            # newer delta wins
        "u2": "newer-in-base",   # newer base wins over older delta
        "u3": "tie-delta",       # equal ts -> delta authoritative
        "u4": "only-base",
        "u6": "only-delta",
    }
