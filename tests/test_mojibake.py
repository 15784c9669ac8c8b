"""X140: mojibake repair (pipeline/mojibake.py).

Pins: the generated table IS the cp1252 decoding of each target's
UTF-8 bytes (and skips the five cp1252 holes); fix(corrupt(s)) == s
for every repairable string, in Spark, matching a pure-Python
application of the same chain; double-encoded text repairs through
the deterministic cascade identically in both the mirror and Spark;
clean ASCII and already-clean accented text pass through unchanged;
NULL propagates; partitioning-invariant.
"""

from __future__ import annotations

from ptt_spider_go_spark.pipeline.mojibake import (
    REPAIR_TABLE,
    TARGET_CHARS,
    corrupt,
    fix_mojibake,
)
from pyspark.sql import functions as F

SCHEMA = "doc_id long, text string"


def _fix_py(s: str) -> str:
    for m, c in REPAIR_TABLE:
        s = s.replace(m, c)
    return s


def _run(spark, texts, parts=4):
    df = spark.createDataFrame(
        list(enumerate(texts)), schema=SCHEMA
    ).repartition(parts)
    rows = df.select(
        "doc_id", fix_mojibake(F.col("text")).alias("fixed")
    ).collect()
    return [r["fixed"] for r in sorted(rows, key=lambda r: r["doc_id"])]


def test_table_is_generated_from_codecs():
    for moji, ch in REPAIR_TABLE:
        assert moji == ch.encode("utf-8").decode("cp1252")
    # the cp1252 holes are excluded automatically (U+201D '”' has a
    # 0x9D byte)
    assert "”" not in {c for _m, c in REPAIR_TABLE}
    assert "”" in TARGET_CHARS
    # longest-first application order
    lens = [len(m) for m, _c in REPAIR_TABLE]
    assert lens == sorted(lens, reverse=True)


def test_roundtrip_and_mirror(spark):
    repairable = "".join(c for _m, c in REPAIR_TABLE)
    samples = [
        "plain ascii only",
        " café – “naïve… ©2026 «résumé» €42",
        repairable,
        "já está – größe Ärger",
        "",
    ]
    dirty = [corrupt(s) for s in samples]
    got = _run(spark, dirty)
    assert got == [_fix_py(d) for d in dirty]
    for s, g in zip(samples, got):
        if all(ch in repairable or ord(ch) < 128 for ch in s):
            assert g == s


def test_clean_text_passes_through(spark):
    clean = ["hello world", "déjà vu – “fine”", "中文 unaffected"]
    assert _run(spark, clean) == [_fix_py(c) for c in clean]
    assert _run(spark, ["hello world"]) == ["hello world"]


def test_double_encoding_cascades_deterministically(spark):
    once = corrupt("é")           # 'Ã©'
    twice = corrupt(once)          # double-encoded
    got = _run(spark, [twice])
    assert got == [_fix_py(twice)]


def test_null_propagates_and_partitioning(spark):
    df = spark.createDataFrame(
        [(0, None), (1, corrupt("café"))], schema=SCHEMA
    )
    rows = {r["doc_id"]: r["f"] for r in df.select(
        "doc_id", fix_mojibake(F.col("text")).alias("f")).collect()}
    assert rows[0] is None and rows[1] == "café"
    dirty = [corrupt(f"d{i} é–… {i}") for i in range(20)]
    assert _run(spark, dirty, parts=2) == _run(spark, dirty, parts=7)
