"""MIME sniffing (X86) and takedown propagation (X87)."""

from pyspark.sql import functions as F

from ptt_spider_go_spark.htmlparse.mimesniff import sniff_mime
from ptt_spider_go_spark.pipeline.retention import (
    retained, takedown_audit, takedown_verdicts,
)

MAGIC = [
    (b"%PDF-1.7 xref", "application/pdf", "document"),
    (b"GIF89a\x01\x02", "image/gif", "image"),
    (b"\x89PNG\r\n\x1a\n....", "image/png", "image"),
    (b"\xff\xd8\xff\xe1Exif", "image/jpeg", "image"),
    (b"\x1f\x8b\x08payload", "application/gzip", "archive"),
    (b"PK\x03\x04meta", "application/zip", "archive"),
    (b"RIFF\x10\x00\x00\x00WEBPVP8 ", "image/webp", "image"),
    (b"\xef\xbb\xbf \t<!DOCTYPE html><p>", "text/html", "html"),
    (b"  <HtMl><head>", "text/html", "html"),
    (b"<!-- comment -->", "text/html", "html"),
    (b"just words, no tags", "text/plain", "text"),
    (b"junk\x00junk", "application/octet-stream", "binary"),
]


def _sniff(spark, rows):
    df = spark.createDataFrame(
        rows, "url string, content_type string, html binary")
    return {r["url"]: r.asDict() for r in sniff_mime(df).collect()}


class TestSniffMime:
    def test_magic_bytes(self, spark):
        rows = [(f"u{i}", None, body) for i, (body, _, _) in enumerate(MAGIC)]
        out = _sniff(spark, rows)
        for i, (_, mime, family) in enumerate(MAGIC):
            r = out[f"u{i}"]
            assert (r["mime"], r["family"]) == (mime, family), MAGIC[i]
            # no declared type -> never a mismatch
            assert r["declared_family"] is None
            assert bool(r["mismatch"]) is False

    def test_mismatch_flags(self, spark):
        out = _sniff(spark, [
            # server says html, bytes say gif -> mismatch
            ("lie", "text/html", b"GIF87a...."),
            # truthful, with parameters
            ("true", "text/html; charset=utf-8", b"<html><body>"),
            # octet-stream declaration = no useful claim
            ("octet", "application/octet-stream", b"GIF87a...."),
            # xhtml declaration is the html family
            ("xhtml", "application/xhtml+xml", b"<html>"),
            # text/plain vs sniffed html -> mismatch
            ("plain", "text/plain", b"<html>"),
        ])
        assert bool(out["lie"]["mismatch"]) is True
        assert bool(out["true"]["mismatch"]) is False
        assert out["octet"]["declared_family"] is None
        assert bool(out["octet"]["mismatch"]) is False
        assert bool(out["xhtml"]["mismatch"]) is False
        assert bool(out["plain"]["mismatch"]) is True

    def test_tag_scan_requires_delimiter(self, spark):
        # '<htmlx' is not an html opener; '<a ' is
        out = _sniff(spark, [
            ("no", None, b"<htmlx>"),
            ("yes", None, b"<a href='x'>"),
        ])
        assert out["no"]["mime"] == "text/plain"
        assert out["yes"]["mime"] == "text/html"


def _corpus(spark):
    rows = [
        ("http://a.ex/p1", "alpha"),
        ("http://a.ex/p2", "shared-body"),
        ("http://b.ex/p1", "shared-body"),   # rehosted copy
        ("http://b.ex/p2", "beta"),
        ("http://c.ex/p1", "gamma"),
    ]
    return spark.createDataFrame(rows, "url string, text string")


def _rules(spark, rows):
    return spark.createDataFrame(rows, "kind string, key string")


class TestTakedowns:
    def test_precedence_and_reasons(self, spark):
        import hashlib
        h = hashlib.md5(b"shared-body").hexdigest()
        docs = _corpus(spark)
        rules = _rules(spark, [
            ("url", "http://a.ex/p2"),          # also hash-matched
            ("host", "c.ex"),
            ("content_hash", h),
        ])
        out = {r["url"]: r.asDict()
               for r in takedown_verdicts(docs, rules).collect()}
        assert out["http://a.ex/p2"]["reason"] == "url"   # beats hash
        assert out["http://b.ex/p1"]["reason"] == "content_hash"
        assert out["http://c.ex/p1"]["reason"] == "host"
        assert out["http://a.ex/p1"]["reason"] is None
        assert bool(out["http://a.ex/p1"]["deleted"]) is False
        assert sum(bool(r["deleted"]) for r in out.values()) == 3

    def test_audit_counts_every_rule(self, spark):
        import hashlib
        h = hashlib.md5(b"shared-body").hexdigest()
        docs = _corpus(spark)
        rules = _rules(spark, [
            ("content_hash", h),                 # both copies count
            ("host", "a.ex"),
            ("url", "http://never.ex/x"),        # zero-match receipt
        ])
        out = {(r["kind"], r["key"]): r["n_matched"]
               for r in takedown_audit(docs, rules).collect()}
        assert out[("content_hash", h)] == 2
        assert out[("host", "a.ex")] == 2
        assert out[("url", "http://never.ex/x")] == 0

    def test_retained_removes_exactly_the_deleted(self, spark):
        docs = _corpus(spark)
        rules = _rules(spark, [("host", "a.ex")])
        left = {r["url"] for r in retained(docs, rules).collect()}
        assert left == {"http://b.ex/p1", "http://b.ex/p2",
                        "http://c.ex/p1"}

    def test_tombstone_survives_refetch_via_merge(self, spark):
        # composition with X73: a verdict row becomes a tombstone in
        # the snapshot merge, so a re-crawl of the taken-down URL
        # does not resurrect it.
        from ptt_spider_go_spark.operators.recrawl import (
            merge_snapshots,
        )
        base = spark.createDataFrame(
            [("http://a.ex/p1", 1, "old", False)],
            "url string, warc_ts int, text string, tombstone boolean",
        ).withColumn("warc_ts", F.timestamp_seconds("warc_ts"))
        delta = spark.createDataFrame(
            [("http://a.ex/p1", 2, None, True)],
            "url string, warc_ts int, text string, tombstone boolean",
        ).withColumn("warc_ts", F.timestamp_seconds("warc_ts"))
        out = merge_snapshots(base, delta).collect()
        assert len(out) == 1 and bool(out[0]["tombstone"]) is True
