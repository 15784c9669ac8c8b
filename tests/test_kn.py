"""X143: interpolated Kneser-Ney bigram scoring (pipeline/lm.py).

Pins: a pure-Python mirror of the full train+score chain (absolute
discount 3/4 folded into the exact-BIGINT common denominator,
continuation add-one over B+V, per-rung single micro-nat rounding)
matches Spark bit-for-bit across all four rungs (seen bigram /
seen-context-unseen-pair / unseen-context / unseen-language); the
continuation signal works — a frequent word locked to one context
("francisco" after "san") costs MORE after a novel context than a
less frequent word seen in many contexts (the Chen-Goodman
motivation, which add-one gets backwards); self-training scores
every bigram as seen; short docs score NULL; partitioning-invariant.
"""

from __future__ import annotations

import math

from ptt_spider_go_spark.pipeline.lm import (
    UNSEEN_LANG_NLL_MICRO,
    kn_scores,
    train_kn,
)

SCHEMA = "doc_id long, text string, lang string"


def _docs(spark, rows, parts=4):
    return spark.createDataFrame(rows, schema=SCHEMA).repartition(parts)


def _mirror(train_rows, score_rows):
    bc: dict = {}
    vocab: dict[str, set] = {}
    for _d, t, l in train_rows:
        toks = t.split()
        vocab.setdefault(l, set()).update(toks)
        for a, b in zip(toks, toks[1:]):
            bc[(l, a, b)] = bc.get((l, a, b), 0) + 1
    cc: dict = {}
    n1f: dict = {}
    n1b: dict = {}
    bt: dict = {}
    for (l, a, b), c in bc.items():
        cc[(l, a)] = cc.get((l, a), 0) + c
        n1f[(l, a)] = n1f.get((l, a), 0) + 1
        n1b[(l, b)] = n1b.get((l, b), 0) + 1
        bt[l] = bt.get(l, 0) + 1

    def nll(l, a, b):
        if l not in bt:
            return UNSEEN_LANG_NLL_MICRO
        bv = bt[l] + len(vocab[l])
        w1 = n1b.get((l, b), 0) + 1
        if (l, a) in cc:
            c = bc.get((l, a, b), 0)
            num = max(4 * c - 3, 0) * bv + 3 * n1f[(l, a)] * w1
            den = 4 * cc[(l, a)] * bv
            return -round(math.log(num / den) * 1_000_000)
        return -round(math.log(w1 / bv) * 1_000_000)

    out = []
    for d, t, l in score_rows:
        toks = t.split()
        pairs = list(zip(toks, toks[1:]))
        if not pairs:
            out.append((d, l, 0, 0, None))
            continue
        s = sum(nll(l, a, b) for a, b in pairs)
        seen = sum(1 for a, b in pairs if (l, a, b) in bc)
        out.append((d, l, len(pairs), seen,
                    round(s / (len(pairs) * 1_000_000.0), 4)))
    return sorted(out)


TRAIN = [
    (0, "san francisco san francisco san francisco", "en"),
    (3, "the dog ran and a dog sat while one dog slept", "en"),
    (6, "the cat sat on the mat", "en"),
    (9, "le chat dort", "fr"),
]
SCORE = TRAIN + [
    (1, "the francisco", "en"),     # seen ctx, unseen pair
    (2, "the dog", "en"),           # seen bigram
    (4, "zzz francisco", "en"),     # unseen ctx, seen word
    (5, "zzz qqq", "en"),           # unseen ctx, unseen word
    (7, "hola mundo", "es"),        # unseen language
    (8, "single", "en"),            # < 2 tokens
]


def _collect(spark, lm_rows, score_rows):
    lm = train_kn(_docs(spark, lm_rows))
    out = kn_scores(_docs(spark, score_rows), lm)
    return sorted(
        (r["doc_id"], r["lang"], r["n_bigrams"], r["n_seen"],
         r["avg_nll"])
        for r in out.collect()
    )


def test_all_rungs_match_mirror(spark):
    assert _collect(spark, TRAIN, SCORE) == _mirror(TRAIN, SCORE)


def test_continuation_beats_raw_frequency(spark):
    # "francisco": raw count 3, but continuation count 1 (only ever
    # after "san"); "dog": raw count 3, continuation count 3. After
    # the novel-but-seen context "the", KN charges francisco MORE.
    got = {r[0]: r for r in _collect(spark, TRAIN, SCORE)}
    nll_francisco = got[1][4]
    nll_dog = got[2][4]
    assert nll_francisco > nll_dog


def test_self_training_sees_everything(spark):
    lm_rows = TRAIN
    got = _collect(spark, lm_rows, lm_rows)
    want = _mirror(lm_rows, lm_rows)
    assert got == want
    for _d, _l, n, n_seen, _a in got:
        assert n == n_seen


def test_short_doc_and_unseen_lang(spark):
    got = {r[0]: r for r in _collect(spark, TRAIN, SCORE)}
    assert got[8][2:] == (0, 0, None)
    assert got[7][4] == round(
        UNSEEN_LANG_NLL_MICRO / 1_000_000.0, 4)


def test_partitioning_invariance(spark):
    a = _collect(spark, TRAIN, SCORE)
    lm = train_kn(_docs(spark, TRAIN, parts=7))
    b = sorted(
        (r["doc_id"], r["lang"], r["n_bigrams"], r["n_seen"],
         r["avg_nll"])
        for r in kn_scores(_docs(spark, SCORE, parts=3), lm).collect()
    )
    assert a == b
