"""X125: multinomial Naive Bayes train + apply (pipeline/nbayes.py).

Pins: a pure-Python mirror of the full train+apply pipeline (same
labeled slices, same Laplace-smoothed integer ratio, same single
per-vocab-term micro-nat rounding, same OOV floor and prior) matches
Spark bit-for-bit; empty docs score exactly the prior; OOV
occurrences are counted and floored; docs written in the positive
exemplars' vocabulary predict positive while negative-vocabulary
docs predict negative; and the result is partitioning-invariant.
"""

from __future__ import annotations

import math

from ptt_spider_go_spark.pipeline.nbayes import (
    LABEL_MOD,
    NEG_RESIDUE,
    POS_RESIDUE,
    nbayes_scores,
)


def _docs(spark, rows, parts=4):
    return spark.createDataFrame(
        rows, schema="doc_id long, text string"
    ).repartition(parts)


def _mirror(rows):
    lab = [
        (d, t, d % LABEL_MOD == POS_RESIDUE)
        for d, t in rows
        if d % LABEL_MOD in (POS_RESIDUE, NEG_RESIDUE)
    ]
    cp: dict[str, int] = {}
    cn: dict[str, int] = {}
    for _d, t, pos in lab:
        for tok in t.split():
            side = cp if pos else cn
            side[tok] = side.get(tok, 0) + 1
    vocab = set(cp) | set(cn)
    pt, nt, v = sum(cp.values()), sum(cn.values()), len(vocab)
    n_pos = sum(1 for *_x, p in lab if p)
    n_neg = len(lab) - n_pos
    prior = (
        round(math.log(n_pos / n_neg) * 1_000_000)
        if n_pos and n_neg else 0
    )
    oov = round(math.log((nt + v) / (pt + v)) * 1_000_000) if v else 0
    llr = {
        tok: round(
            math.log(
                ((cp.get(tok, 0) + 1) * (nt + v))
                / ((cn.get(tok, 0) + 1) * (pt + v))
            )
            * 1_000_000
        )
        for tok in vocab
    }
    out = []
    for d, t in rows:
        toks = t.split()
        s = sum(llr.get(tok, oov) for tok in toks) + prior
        n_oov = sum(1 for tok in toks if tok not in llr)
        out.append((d, len(toks), n_oov, s, s > 0))
    return sorted(out)


def test_matches_pure_python_mirror(spark):
    rows = [
        (0, "good fine solid good prose"),      # positive exemplar
        (97, "fine clear good text"),            # positive exemplar
        (1, "spam junk spam click here"),        # negative exemplar
        (98, "junk click buy buy"),              # negative exemplar
        (5, "good fine text with novel words"),  # unlabeled, OOV mix
        (6, ""),                                  # empty
        (7, "spam click junk"),
    ]
    got = [
        (r["doc_id"], r["n_tokens"], r["n_oov"],
         r["score_micro"], r["predict_pos"])
        for r in nbayes_scores(_docs(spark, rows)).collect()
    ]
    assert got == _mirror(rows)


def test_empty_doc_scores_exactly_the_prior(spark):
    # 2 positive vs 1 negative labeled docs -> prior = ln 2 micro-nats.
    rows = [(0, "a b"), (97, "a c"), (1, "z z"), (6, "")]
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"], r["score_micro"])
        for r in nbayes_scores(_docs(spark, rows)).collect()
    }
    assert got[6] == (0, 0, round(math.log(2) * 1_000_000))


def test_oov_floor_and_count(spark):
    rows = [
        (0, "alpha beta"), (1, "gamma delta"),
        (5, "alpha zzz-unseen yyy-unseen"),
    ]
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"])
        for r in nbayes_scores(_docs(spark, rows)).collect()
    }
    assert got[5] == (3, 2)
    # labeled docs are never OOV against their own vocabulary
    assert got[0] == (2, 0) and got[1] == (2, 0)


def test_class_separation(spark):
    rows = [
        (0, "good fine solid prose here"),
        (97, "good clear fine writing here"),
        (1, "spam junk click buy now"),
        (98, "junk spam buy click now"),
        (10, "good fine prose"),   # positive vocabulary
        (11, "spam junk buy"),     # negative vocabulary
    ]
    got = {
        r["doc_id"]: (r["score_micro"], r["predict_pos"])
        for r in nbayes_scores(_docs(spark, rows)).collect()
    }
    assert got[10][1] and not got[11][1]
    assert got[10][0] > 0 > got[11][0]


def test_partitioning_invariant(spark):
    rows = [
        (i, " ".join(f"w{(i * 11 + j) % 29}" for j in range(8)))
        for i in range(150)
    ]
    a = nbayes_scores(_docs(spark, rows, parts=1)).collect()
    b = nbayes_scores(_docs(spark, rows, parts=9)).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
