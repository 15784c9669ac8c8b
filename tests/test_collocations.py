"""X126: PMI collocation mining (pipeline/collocations.py).

Pins: a pure-Python word2phrase mirror (same counts, same discounted
integer ratio, same single micro-nat rounding, same (score DESC, a,
b) total order and top-k cut) matches Spark bit-for-bit; the
min-count filter drops rare pairs before scoring; a pair that is
always adjacent outranks an equally frequent independent pair; and
the result is partitioning-invariant.
"""

from __future__ import annotations

import math

from ptt_spider_go_spark.pipeline.collocations import DELTA, collocations


def _docs(spark, rows, parts=4):
    return spark.createDataFrame(
        rows, schema="doc_id long, text string"
    ).repartition(parts)


def _mirror(rows, min_count=3, k=100):
    uni: dict[str, int] = {}
    big: dict[tuple[str, str], int] = {}
    for _d, t in rows:
        toks = t.split()
        for tok in toks:
            uni[tok] = uni.get(tok, 0) + 1
        for a, b in zip(toks, toks[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    n = sum(uni.values())
    out = []
    for (a, b), c_ab in big.items():
        if c_ab < max(min_count, DELTA + 1):
            continue
        s = round(
            math.log((c_ab - DELTA) * n / (uni[a] * uni[b])) * 1_000_000
        )
        out.append((a, b, c_ab, uni[a], uni[b], s))
    out.sort(key=lambda r: (-r[5], r[0], r[1]))
    return out[:k]


def test_matches_pure_python_mirror(spark):
    rows = [
        (0, "new york is big new york is old"),
        (1, "big apple new york the apple is red"),
        (2, "the new york subway is old and big"),
        (3, "red apple big apple the apple"),
    ]
    got = [
        (r["a"], r["b"], r["c_ab"], r["c_a"], r["c_b"], r["score_micro"])
        for r in collocations(_docs(spark, rows)).collect()
    ]
    assert got == _mirror(rows)


def test_min_count_prunes_rare_pairs(spark):
    # "rare pair" appears twice < min_count=3 -> absent even though
    # its PMI would be high.
    rows = [
        (0, "rare pair x rare pair"),
        (1, "a b a b a b a b"),
    ]
    got = collocations(_docs(spark, rows)).collect()
    pairs = {(r["a"], r["b"]) for r in got}
    assert ("rare", "pair") not in pairs
    assert ("a", "b") in pairs


def test_adhesive_pair_outranks_independent_pair(spark):
    # 'san francisco' tokens only ever co-occur; 'the'/'cat' are
    # equally frequent but mostly apart -> lower PMI.
    rows = [
        (0, "san francisco the cat the dog san francisco"),
        (1, "the bird san francisco cat the"),
        (2, "san francisco cat dog the"),
    ]
    got = [
        (r["a"], r["b"]) for r in collocations(_docs(spark, rows)).collect()
    ]
    assert got[0] == ("san", "francisco")


def test_topk_cut_and_order(spark):
    rows = [
        (i, " ".join(f"t{(i * 13 + j) % 7}" for j in range(30)))
        for i in range(40)
    ]
    got = [
        (r["a"], r["b"], r["c_ab"], r["c_a"], r["c_b"], r["score_micro"])
        for r in collocations(_docs(spark, rows), k=5).collect()
    ]
    assert got == _mirror(rows, k=5)
    assert len(got) == 5


def test_partitioning_invariant(spark):
    rows = [
        (i, " ".join(f"w{(i + j) % 11}" for j in range(20)))
        for i in range(100)
    ]
    a = collocations(_docs(spark, rows, parts=1)).collect()
    b = collocations(_docs(spark, rows, parts=9)).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
