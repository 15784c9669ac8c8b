"""WARC response-record source/sink (sources/warc.py): byte-exact
round-trips under adversarial payloads, ISO 28500 header
case-insensitivity, non-response record skipping, and the
double-Content-Length consistency check. (Spark-vs-DuckDB parity on
the full synthetic envelope is additionally enforced by the
`warc_roundtrip` contract query.)
"""

import random

import pytest

from ptt_spider_go_spark.sources import warc
from ptt_spider_go_spark.sources.warc import _parse_warc_bytes

SEED = 0x5741


def _pages(spark, rows):
    return spark.createDataFrame(
        rows,
        "doc_id long, url string, warc_date string, status int, "
        "payload string",
    )


def _roundtrip(spark, tmp_path, rows, n_files=3):
    path = str(tmp_path / "warc")
    warc.write_warc(_pages(spark, rows), path, n_files=n_files)
    got = sorted(warc.read_warc(spark, path).collect(),
                 key=lambda r: r["doc_id"])
    return [(r["doc_id"], r["url"], r["warc_date"], r["status"],
             r["mime"], r["payload"]) for r in got]


def test_roundtrip_adversarial_payloads(spark, tmp_path):
    """Payloads containing record markers, bare CRs, CRLFCRLF runs,
    multi-byte text, and the empty string cannot desync the
    Content-Length framing."""
    rows = [
        (1, "http://a.example/1", "2026-08-01T00:00:00Z", 200,
         "\r\n\r\nWARC/1.1\r\nWARC-Type: response\r\n\r\nfake"),
        (2, "http://a.example/2", "2026-08-02T00:00:00Z", 404, ""),
        (3, "http://a.example/3", "2026-08-03T00:00:00Z", 200,
         "饕餮🦀 café\nHTTP/1.1 500 Oops\r\nContent-Length: 0\r\n\r\n"),
        (4, "http://a.example/4", "2026-08-04T00:00:00Z", 200,
         "ends with separator\r\n\r\n"),
    ]
    got = _roundtrip(spark, tmp_path, rows)
    want = [(d, u, t, s, "text/html; charset=UTF-8", p)
            for d, u, t, s, p in rows]
    assert got == want


def test_roundtrip_fuzz(spark, tmp_path):
    """Random unicode payloads round-trip byte-exactly across shards."""
    rng = random.Random(SEED)
    alphabet = list("xy \r\n:饕🦀") + ["WARC/1.1\r\n", "\r\n\r\n",
                                      "Content-Length: 3\r\n"]
    rows = [
        (i, f"http://h{i % 7}.example/p{i}", "2026-08-10T12:00:00Z",
         rng.choice([200, 404]),
         "".join(rng.choice(alphabet)
                 for _ in range(rng.randrange(0, 40))))
        for i in range(150)
    ]
    got = _roundtrip(spark, tmp_path, rows, n_files=5)
    want = [(d, u, t, s, "text/html; charset=UTF-8", p)
            for d, u, t, s, p in rows]
    assert got == want


def test_header_case_insensitive_and_1_0_magic():
    """Hand-built WARC/1.0 bytes with lowercased header names parse
    (ISO 28500 field names are case-insensitive); reason phrases with
    spaces don't confuse the status split."""
    payload = "hi there".encode()
    http = (b"HTTP/1.1 404 Not Found\r\n"
            b"content-type: text/plain\r\n\r\n" + payload)
    rec = (b"WARC/1.0\r\n"
           b"warc-type: response\r\n"
           b"WARC-RECORD-ID: <urn:doc:9>\r\n"
           b"warc-target-uri: http://x.example/\r\n"
           b"warc-date: 2026-01-01T00:00:00Z\r\n"
           b"content-length: " + str(len(http)).encode() + b"\r\n"
           b"\r\n" + http + b"\r\n\r\n")
    [(doc_id, url, date, status, mime, body, off, rlen)] = list(
        _parse_warc_bytes(rec))
    assert (doc_id, url, status, mime, body) == (
        9, "http://x.example/", 404, "text/plain", "hi there")
    assert (off, rlen) == (0, len(rec))


def test_non_response_records_skipped():
    """warcinfo/request records are framed past, not yielded — a real
    WARC interleaves them with responses."""
    info = b"software: test\r\n"
    rec1 = (b"WARC/1.1\r\nWARC-Type: warcinfo\r\n"
            b"Content-Length: " + str(len(info)).encode() + b"\r\n"
            b"\r\n" + info + b"\r\n\r\n")
    http = b"HTTP/1.1 200 OK\r\n\r\nok"
    rec2 = (b"WARC/1.1\r\nWARC-Type: response\r\n"
            b"WARC-Record-ID: <urn:doc:1>\r\n"
            b"Content-Length: " + str(len(http)).encode() + b"\r\n"
            b"\r\n" + http + b"\r\n\r\n")
    got = list(_parse_warc_bytes(rec1 + rec2))
    assert len(got) == 1 and got[0][0] == 1 and got[0][5] == "ok"


def test_concatenation_is_composition(spark, tmp_path):
    """cat of two shard files is a valid WARC: parse both records."""
    rows = [(1, "http://a/1", "d", 200, "one"),
            (2, "http://a/2", "d", 200, "two")]
    path = str(tmp_path / "warc")
    warc.write_warc(_pages(spark, rows), path, n_files=2)
    import glob
    parts = sorted(glob.glob(f"{path}/part-*"))
    blob = b"".join(open(p, "rb").read() for p in parts)
    got = sorted(_parse_warc_bytes(blob))
    assert [(g[0], g[5]) for g in got] == [(1, "one"), (2, "two")]


def test_length_mismatch_raises():
    """Inner HTTP Content-Length disagreeing with the outer WARC
    framing is corruption, not something to guess past."""
    http = b"HTTP/1.1 200 OK\r\nContent-Length: 99\r\n\r\nok"
    rec = (b"WARC/1.1\r\nWARC-Type: response\r\n"
           b"WARC-Record-ID: <urn:doc:1>\r\n"
           b"Content-Length: " + str(len(http)).encode() + b"\r\n"
           b"\r\n" + http + b"\r\n\r\n")
    with pytest.raises(ValueError, match="mismatch"):
        list(_parse_warc_bytes(rec))


def test_bad_magic_raises():
    with pytest.raises(ValueError, match="bad magic"):
        list(_parse_warc_bytes(b"WARC/9.9\r\n\r\n"))
