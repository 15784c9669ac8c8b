"""JSONL source/sink (sources/jsonl.py): round-trip, quarantine of
corrupt lines, and shard composability. (The identity round-trip at
corpus scale is additionally enforced on `jsonl_roundtrip` by the
driver contract / tools/check_contract.py.)
"""

import json
import os

from ptt_spider_go_spark.sources import jsonl

SCHEMA = "doc_id long, text string, lang string"


def test_roundtrip_exact(spark, tmp_path):
    rows = [
        (1, "hello world", "en"),
        (2, 'quotes " and \\ backslashes \n newline', "en"),
        (3, "中文字符 und ümlauts", "zh"),
        (4, "", "de"),
    ]
    docs = spark.createDataFrame(rows, SCHEMA)
    path = str(tmp_path / "shards")
    jsonl.write_jsonl(docs, path, n_files=3)
    good, quar = jsonl.read_jsonl(spark, path, SCHEMA)
    assert quar.count() == 0
    got = sorted(map(tuple, good.collect()))
    assert got == sorted(rows)


def test_corrupt_lines_quarantined_not_fatal(spark, tmp_path):
    """Bad bytes in one shard must not kill the read or poison the
    good rows — they land in the quarantine leg with the raw line."""
    path = str(tmp_path / "mixed")
    os.makedirs(path)
    with open(os.path.join(path, "part-0.txt"), "w") as fh:
        fh.write(json.dumps(
            {"doc_id": 1, "text": "fine", "lang": "en"}) + "\n")
        fh.write("{not json at all\n")
        fh.write(json.dumps(
            {"doc_id": 2, "text": "also fine", "lang": "en"}) + "\n")
        fh.write('["wrong", "shape"]\n')
    good, quar = jsonl.read_jsonl(spark, path, SCHEMA)
    assert sorted(r["doc_id"] for r in good.collect()) == [1, 2]
    q = quar.collect()
    assert len(q) == 2
    assert all(r["cause"] == "malformed_json" for r in q)
    assert any("not json" in r["raw_line"] for r in q)


def test_shards_compose_by_concatenation(spark, tmp_path):
    """Every part file is a standalone JSONL shard: reading a single
    part yields a subset, reading the dir yields the union."""
    docs = spark.createDataFrame(
        [(i, f"t{i}", "en") for i in range(20)], SCHEMA
    )
    path = str(tmp_path / "comp")
    jsonl.write_jsonl(docs, path, n_files=4)
    parts = [f for f in os.listdir(path) if f.startswith("part-")]
    assert len(parts) == 4
    one, _ = jsonl.read_jsonl(spark, os.path.join(path, parts[0]), SCHEMA)
    n_one = one.count()
    assert 0 < n_one < 20
    whole, _ = jsonl.read_jsonl(spark, path, SCHEMA)
    assert whole.count() == 20


def test_sitemap_entries_both_shapes(spark):
    """urlset pages + sitemapindex references in one pass: whitespace
    inside <loc> is trimmed, absent <lastmod> is NULL, and the <urlset>
    wrapper never false-matches the <url> block regex."""
    from ptt_spider_go_spark.sources import sitemap

    urlset = (
        "<urlset>"
        "<url><loc> https://a.example/p1 </loc>"
        "<lastmod>2024-02-03</lastmod></url>"
        "<url><loc>https://a.example/p2</loc></url>"
        "</urlset>"
    )
    index = (
        "<sitemapindex>"
        "<sitemap><loc>https://a.example/s1.xml</loc>"
        "<lastmod>2024-01-01</lastmod></sitemap>"
        "<sitemap><loc>\nhttps://a.example/s2.xml\n</loc></sitemap>"
        "</sitemapindex>"
    )
    df = spark.createDataFrame([(urlset,), (index,)], "xml string")
    got = {(r["kind"], r["url"]): r["lastmod"]
           for r in sitemap.sitemap_entries(df).collect()}
    assert got == {
        ("page", "https://a.example/p1"): "2024-02-03",
        ("page", "https://a.example/p2"): None,
        ("sitemap", "https://a.example/s1.xml"): "2024-01-01",
        ("sitemap", "https://a.example/s2.xml"): None,
    }


def test_robots_sitemap_directives_compose_with_sitemap_source(spark):
    """The discovery chain closes: robots.txt Sitemap: lines (global,
    case-insensitive, comments excluded) name sitemap files whose
    entries the sitemap source then flattens into frontier seeds."""
    from ptt_spider_go_spark.sources import sitemap
    from ptt_spider_go_spark.sources.robots import sitemap_directives

    robots = spark.createDataFrame(
        [("a.example",
          "User-agent: *\nDisallow: /x\n"
          "# Sitemap: https://a.example/commented.xml\n"
          "SITEMAP: https://a.example/s.xml\n")],
        "host string, body string",
    )
    directives = {(r["host"], r["sitemap_url"])
                  for r in sitemap_directives(robots).collect()}
    assert directives == {("a.example", "https://a.example/s.xml")}

    fetched = spark.createDataFrame(
        [("<urlset><url><loc>https://a.example/p1</loc></url></urlset>",)],
        "xml string",
    )
    seeds = {(r["kind"], r["url"])
             for r in sitemap.sitemap_entries(fetched).collect()}
    assert seeds == {("page", "https://a.example/p1")}


def test_normalize_text_unicode_cases(spark):
    from ptt_spider_go_spark.pipeline import textstats

    rows = [
        (1, "café und  doppel\tspace"),   # NFC + ws collapse
        (2, "ctrl\x07byte\x1fhere"),            # C0 strip
        (3, "  already clean  "),               # trim only
        (4, "nothing to do"),                   # unchanged
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["norm_text"], r["changed"])
           for r in textstats.normalize_text(docs).collect()}
    assert got[1] == ("café und doppel space", True)
    assert got[2] == ("ctrlbytehere", True)
    assert got[3] == ("already clean", True)
    assert got[4] == ("nothing to do", False)
