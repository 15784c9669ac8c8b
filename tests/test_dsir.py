"""X124: DSIR hashed n-gram importance weights (pipeline/dsir.py).

Pins: a pure-Python mirror of the full pipeline (same md5 bucket
hash, same Laplace-smoothed integer ratio, same single per-bucket
micro-nat rounding, same occurrence-multiplicity sums) matches Spark
bit-for-bit; bigrams require ≥2 tokens and empty docs score (0, 0);
feature occurrences count with multiplicity; a document stuffed with
target-exclusive vocabulary outscores one stuffed with raw-exclusive
vocabulary; and the result is partitioning-invariant.
"""

from __future__ import annotations

import hashlib
import math

from ptt_spider_go_spark.pipeline.dsir import (
    N_BUCKETS,
    TARGET_MOD,
    dsir_weights,
)


def _docs(spark, rows, parts=4):
    return spark.createDataFrame(
        rows, schema="doc_id long, text string"
    ).repartition(parts)


def _bucket(f: str) -> int:
    return int(hashlib.md5(f.encode()).hexdigest()[:15], 16) % N_BUCKETS


def _mirror(rows):
    feats = []  # (doc_id, bucket, is_target)
    for doc_id, text in rows:
        toks = [t for t in text.split() if t]
        fs = toks + [
            f"{a} {b}" for a, b in zip(toks, toks[1:])
        ]
        for f in fs:
            feats.append((doc_id, _bucket(f), doc_id % TARGET_MOD == 0))
    ct: dict[int, int] = {}
    cr: dict[int, int] = {}
    for _d, b, is_t in feats:
        (ct if is_t else cr)[b] = (ct if is_t else cr).get(b, 0) + 1
    tt, rt = sum(ct.values()), sum(cr.values())
    llr = {
        b: round(
            math.log(
                ((ct.get(b, 0) + 1) * (rt + N_BUCKETS))
                / ((cr.get(b, 0) + 1) * (tt + N_BUCKETS))
            )
            * 1_000_000
        )
        for b in set(ct) | set(cr)
    }
    out = {d: [0, 0] for d, _ in rows}
    for d, b, _t in feats:
        out[d][0] += 1
        out[d][1] += llr[b]
    return sorted((d, n, w) for d, (n, w) in out.items())


def test_matches_pure_python_mirror(spark):
    rows = [
        (0, "alpha beta gamma alpha"),       # target (0 % 97 == 0)
        (1, "beta delta epsilon"),
        (2, "alpha alpha zeta"),
        (97, "gamma gamma eta theta"),        # target
        (5, ""),
        (6, "solo"),
    ]
    got = [
        (r["doc_id"], r["n_feats"], r["weight_micro"])
        for r in dsir_weights(_docs(spark, rows)).collect()
    ]
    assert got == _mirror(rows)


def test_empty_and_single_token_docs(spark):
    rows = [(0, "a b"), (1, ""), (2, "x")]
    got = {
        r["doc_id"]: (r["n_feats"], r["weight_micro"])
        for r in dsir_weights(_docs(spark, rows)).collect()
    }
    assert got[1] == (0, 0)
    assert got[2][0] == 1      # one unigram, no bigram
    assert got[0][0] == 3      # two unigrams + one bigram


def test_multiplicity_counts(spark):
    # doc 3 repeats the same token: n_feats grows with occurrences,
    # and the weight is the per-occurrence sum (mirror-checked).
    rows = [(0, "t t t"), (3, "t t t t t t")]
    got = [
        (r["doc_id"], r["n_feats"], r["weight_micro"])
        for r in dsir_weights(_docs(spark, rows)).collect()
    ]
    assert got == _mirror(rows)
    by = dict((d, (n, w)) for d, n, w in got)
    assert by[3][0] == 11 and by[0][0] == 5


def test_target_vocabulary_scores_higher(spark):
    # target docs (0, 97) are stuffed with 'good*' vocabulary; raw
    # doc 10 shares it, raw doc 11 uses disjoint 'junk*' vocabulary.
    rows = [
        (0, "good1 good2 good3 good4 good1 good2"),
        (97, "good1 good3 good5 good2 good4 good5"),
        (10, "good1 good2 good3 good4 good5 good1"),
        (11, "junk1 junk2 junk3 junk4 junk5 junk1"),
    ]
    got = {
        r["doc_id"]: r["weight_micro"]
        for r in dsir_weights(_docs(spark, rows)).collect()
    }
    assert got[10] > got[11]


def test_partitioning_invariant(spark):
    rows = [
        (i, " ".join(f"w{(i * 7 + j) % 23}" for j in range(10)))
        for i in range(120)
    ]
    a = dsir_weights(_docs(spark, rows, parts=1)).collect()
    b = dsir_weights(_docs(spark, rows, parts=9)).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
