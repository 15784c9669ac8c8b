"""X133: trained char-bigram language classifier (pipeline/langid.py).

Pins: a pure-Python mirror of the full train+apply chain (sample
slice, prefix cap, dense Laplace-smoothed per-lang gram model, single
micro-nat rounding per (gram, lang), per-lang OOV floor, priors,
lex-smallest argmax tie-break, runner-up margin) matches Spark
bit-for-bit; gram-less docs score exactly the priors; OOV grams are
counted and floored; a symmetric fixture breaks ties toward the
lexicographically smallest language; only the first PREFIX_CHARS
characters matter; distinct-bigram languages classify correctly and
the confusion matrix accounts for every doc; and the result is
partitioning-invariant.
"""

from __future__ import annotations

import math

from ptt_spider_go_spark.pipeline.langid import (
    PREFIX_CHARS,
    SAMPLE_MOD,
    langid_confusion,
    langid_scores,
)

SCHEMA = "doc_id long, text string, lang string"


def _docs(spark, rows, parts=4):
    return spark.createDataFrame(rows, schema=SCHEMA).repartition(parts)


def _grams(text):
    p = text[:PREFIX_CHARS]
    return [p[i:i + 2] for i in range(len(p) - 1)]


def _mirror(rows):
    train = [r for r in rows if r[0] % SAMPLE_MOD == 0]
    langs = sorted({l for _d, _t, l in train})
    n_docs = {l: sum(1 for r in train if r[2] == l) for l in langs}
    n_train = len(train)
    counts: dict[tuple[str, str], int] = {}
    for _d, t, l in train:
        for g in _grams(t):
            counts[(g, l)] = counts.get((g, l), 0) + 1
    vocab = {g for g, _l in counts}
    v = len(vocab)
    totals = {
        l: sum(c for (_g, l2), c in counts.items() if l2 == l)
        for l in langs
    }
    prior = {
        l: round(math.log(n_docs[l] / n_train) * 1_000_000)
        if n_train and n_docs[l] else 0
        for l in langs
    }
    floor = {
        l: round(math.log(1.0 / (totals[l] + v)) * 1_000_000)
        if totals[l] + v else 0
        for l in langs
    }
    lp = {
        (g, l): round(
            math.log((counts.get((g, l), 0) + 1) / (totals[l] + v))
            * 1_000_000
        )
        for g in vocab
        for l in langs
    }
    out = []
    for d, t, l in rows:
        gs = _grams(t)
        sc = {
            L: sum(
                lp[(g, L)] if g in vocab else floor[L] for g in gs
            ) + prior[L]
            for L in langs
        }
        pred = sorted(langs, key=lambda L: (-sc[L], L))[0]
        vals = sorted(sc.values())
        margin = sc[pred] - (vals[-2] if len(vals) >= 2 else sc[pred])
        n_oov = sum(1 for g in gs if g not in vocab)
        out.append((d, l, pred, len(gs), n_oov, sc[pred], margin, pred == l))
    return sorted(out)


def _collect(df):
    return [
        (r["doc_id"], r["lang"], r["pred_lang"], r["n_grams"], r["n_oov"],
         r["score_micro"], r["margin_micro"], r["agree"])
        for r in df.collect()
    ]


FIXTURE = [
    (0, "the cat sat on the mat", "en"),
    (3, "then the hen went thence", "en"),
    (6, "le chat est sur le lit", "fr"),
    (9, "les chats chantent", "fr"),
    (12, "aaa bbb aaa", "xx"),
    (1, "the hen and the cat", "en"),        # unlabeled (scored only)
    (2, "le lit de le chat", "fr"),
    (4, "zzz qqq vvv", "en"),                # heavy OOV
    (5, "", "fr"),                            # gram-less
    (7, "x", "xx"),                           # 1-char prefix -> no grams
]


def test_matches_pure_python_mirror(spark):
    got = _collect(langid_scores(_docs(spark, FIXTURE)))
    assert sorted(got) == _mirror(FIXTURE)


def test_gramless_doc_scores_exactly_the_priors(spark):
    # train: two en docs, one fr doc -> priors ln(2/3), ln(1/3).
    rows = [
        (0, "ab ab", "en"), (6, "ab ba", "en"), (3, "cd cd", "fr"),
        (5, "", "en"),
    ]
    got = {r[0]: r for r in _collect(langid_scores(_docs(spark, rows)))}
    p_en = round(math.log(2 / 3) * 1_000_000)
    p_fr = round(math.log(1 / 3) * 1_000_000)
    d, _lang, pred, n_grams, n_oov, score, margin, _agree = got[5]
    assert (n_grams, n_oov) == (0, 0)
    assert pred == "en" and score == p_en and margin == p_en - p_fr


def test_oov_grams_hit_the_floor(spark):
    rows = [
        (0, "abcd", "en"), (3, "efgh", "fr"),
        (1, "zzzz", "en"),  # every bigram unseen
    ]
    got = {r[0]: r for r in _collect(langid_scores(_docs(spark, rows)))}
    _d, _l, _pred, n_grams, n_oov, score, _m, _a = got[1]
    assert n_grams == 3 and n_oov == 3
    # both langs floored identically (equal totals) -> margin from
    # the (equal) priors alone = 0, tie broken to 'en'.
    assert got[1][2] == "en" and got[1][6] == 0


def test_tie_breaks_to_lexicographically_smallest(spark):
    # perfectly symmetric classes: identical gram multisets per class.
    rows = [
        (0, "abab", "zz"), (3, "abab", "aa"),
        (2, "abab", "qq"),  # scored doc, exact tie between aa and zz
    ]
    got = {r[0]: r for r in _collect(langid_scores(_docs(spark, rows)))}
    assert got[2][2] == "aa" and got[2][6] == 0


def test_only_the_prefix_matters(spark):
    base = "ab" * (PREFIX_CHARS // 2)
    rows = [
        (0, base, "en"), (3, "cdcd", "fr"),
        (1, base + " totally different tail xyz", "en"),
        (2, base, "en"),
    ]
    got = {r[0]: r for r in _collect(langid_scores(_docs(spark, rows)))}
    assert got[1][2:] == got[2][2:]


def test_separation_and_confusion_totals(spark):
    rows = []
    for i in range(30):
        # distinct bigram alphabets per language
        rows.append((i * 3, "abab abba baba", "en"))
        rows.append((90 + i * 3, "cdcd cddc dcdc", "fr"))
    for i in range(10):
        rows.append((301 + i * 3, "ab ba ab", "en"))
        rows.append((401 + i * 3, "cd dc cd", "fr"))
    df = _docs(spark, rows)
    scored = {r[0]: r for r in _collect(langid_scores(df))}
    assert all(r[2] == "en" for d, r in scored.items()
               if r[1] == "en" and r[3] > 0)
    assert all(r[2] == "fr" for d, r in scored.items()
               if r[1] == "fr" and r[3] > 0)
    conf = langid_confusion(df).collect()
    assert sum(r["n_docs"] for r in conf) == len(rows)
    assert all(r["lang"] == r["pred_lang"] for r in conf)


def test_partitioning_invariance(spark):
    a = _collect(langid_scores(_docs(spark, FIXTURE, parts=2)))
    b = _collect(langid_scores(_docs(spark, FIXTURE, parts=7)))
    assert a == b
