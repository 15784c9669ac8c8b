"""X141: character-entropy quality signal (pipeline/entropy.py).

Pins: a pure-Python mirror of the micro-nat entropy (per-char term
rounded once, integer floor division) matches Spark exactly;
single-char padding scores ~0 and flags is_low; a 70-distinct-char
uniform string exceeds the high band; natural-ish text sits between
the bands; empty docs report zeros and flag is_low; the metric is
within 1 micro-nat-per-distinct-char of the real-valued entropy;
partitioning-invariant.
"""

from __future__ import annotations

import math
from collections import Counter

from ptt_spider_go_spark.pipeline.entropy import (
    HIGH_MICRO,
    LOW_MICRO,
    char_entropy,
)

SCHEMA = "doc_id long, text string"


def _docs(spark, rows, parts=4):
    return spark.createDataFrame(rows, schema=SCHEMA).repartition(parts)


def _mirror(text: str):
    c = Counter(text)
    n = sum(c.values())
    if n == 0:
        return (0, 0, 0, True, False)
    terms = sum(round(k * math.log(k) * 1_000_000) for k in c.values())
    ent = round(math.log(n) * 1_000_000) - terms // n
    return (n, len(c), ent, ent < LOW_MICRO, ent > HIGH_MICRO)


FIXTURE = [
    (1, "aaaaaaaaaaaaaaaaaaaaaaaa"),                 # padding -> ~0
    (2, "the quick brown fox jumps over the lazy dog and keeps going"),
    (3, ""),                                          # empty
    (4, "".join(chr(33 + i) for i in range(70)) * 3),  # 70-char uniform
    (5, "abababababababab"),                          # 2-symbol -> ln 2
    (6, "x"),
]


def test_matches_pure_python_mirror(spark):
    got = {
        r["doc_id"]: (r["n_chars"], r["n_distinct_chars"],
                      r["entropy_micro"], r["is_low"], r["is_high"])
        for r in char_entropy(_docs(spark, FIXTURE)).collect()
    }
    assert got == {d: _mirror(t) for d, t in FIXTURE}


def test_bands(spark):
    got = {r["doc_id"]: r
           for r in char_entropy(_docs(spark, FIXTURE)).collect()}
    assert got[1]["entropy_micro"] <= 1 and got[1]["is_low"]
    assert got[3] ["is_low"] and got[3]["n_chars"] == 0
    assert got[4]["is_high"]          # ln 70 ~ 4.25 > 4.2
    assert not got[2]["is_low"] and not got[2]["is_high"]
    # two-symbol alternation: exactly ln 2 within the per-term bound
    assert abs(got[5]["entropy_micro"]
               - round(math.log(2) * 1_000_000)) <= 2


def test_accuracy_bound(spark):
    rows = [(i, f"sample text number {i} with words {i % 7}")
            for i in range(30)]
    got = {r["doc_id"]: r for r in
           char_entropy(_docs(spark, rows)).collect()}
    for d, t in rows:
        c = Counter(t)
        n = len(t)
        true_h = math.log(n) - sum(
            k * math.log(k) for k in c.values()) / n
        # per-term rounding + the floor division: within
        # (|alphabet| + 1) micro-nats of the real value
        assert abs(got[d]["entropy_micro"] - true_h * 1_000_000) \
            <= len(c) + 1


def test_partitioning_invariance(spark):
    a = [tuple(r) for r in
         char_entropy(_docs(spark, FIXTURE, parts=2)).collect()]
    b = [tuple(r) for r in
         char_entropy(_docs(spark, FIXTURE, parts=7)).collect()]
    assert a == b
