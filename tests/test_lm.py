"""Bigram-LM document scoring (pipeline/lm.py): hand-computed costs,
backoff ladder, and degenerate documents.

(Spark-vs-DuckDB value parity is additionally enforced by the driver
contract / tools/check_contract.py on `lm_perplexity`.)
"""

import math

import pytest

from ptt_spider_go_spark.pipeline import lm


def _scores(df):
    return {
        r["doc_id"]: (r["n_bigrams"], r["avg_nll"]) for r in df.collect()
    }


def test_hand_computed_self_score(spark):
    """Corpus = one doc 'x y x y': c(x,y)=2, c(y,x)=1, c_prev(x)=2,
    c_prev(y)=1, V=2. p(y|x)=3/4, p(x|y)=2/3; micro-nat costs 287682
    and 405465; avg = (2*287682 + 405465) / (3 * 1e6) -> 0.3269."""
    docs = spark.createDataFrame(
        [(1, "x y x y", "en")], "doc_id long, text string, lang string"
    )
    n, avg = _scores(lm.lm_scores(docs))[1]
    assert n == 3
    c_xy = -round(math.log(3 / 4) * 1_000_000)
    c_yx = -round(math.log(2 / 3) * 1_000_000)
    assert avg == pytest.approx(round((2 * c_xy + c_yx) / 3e6, 4))


def test_repetitive_beats_diverse(spark):
    """The CCNet ranking property: under a self-trained LM, a document
    of repeated high-probability bigrams scores lower (more fluent)
    than one of all-distinct bigrams."""
    docs = spark.createDataFrame(
        [
            (1, "a b a b a b a b a b", "en"),
            (2, "c d e f g h i j k l", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    s = _scores(lm.lm_scores(docs))
    assert s[1][1] < s[2][1]


def test_short_docs_score_null(spark):
    docs = spark.createDataFrame(
        [(1, "", "en"), (2, "solo", "en"), (3, "two tokens", "en")],
        "doc_id long, text string, lang string",
    )
    s = _scores(lm.lm_scores(docs))
    assert s[1] == (0, None)
    assert s[2] == (0, None)
    assert s[3][0] == 1 and s[3][1] is not None


def test_backoff_ladder_on_held_out_docs(spark):
    """Scoring a new batch against a FIXED LM exercises every backoff
    rung: seen bigram -> seen context/unseen continuation -> unseen
    context -> unseen language."""
    corpus = spark.createDataFrame(
        [(1, "x y x y", "en")], "doc_id long, text string, lang string"
    )
    model = lm.train_bigram_lm(corpus)
    new = spark.createDataFrame(
        [
            (10, "x y", "en"),    # seen bigram: p = 3/4
            (11, "x q", "en"),    # seen context x, unseen cur: p = 1/(2+2)
            (12, "q r", "en"),    # unseen context: p = 1/(V+1) = 1/3
            (13, "x y", "xx"),    # unseen language: p = 1/2
        ],
        "doc_id long, text string, lang string",
    )
    s = _scores(lm.lm_scores(new, model))

    def nll(p):
        return round(-round(math.log(p) * 1_000_000) / 1e6, 4)

    assert s[10][1] == pytest.approx(nll(3 / 4))
    assert s[11][1] == pytest.approx(nll(1 / 4))
    assert s[12][1] == pytest.approx(nll(1 / 3))
    assert s[13][1] == pytest.approx(nll(1 / 2))


def test_tfidf_topk_hand_case(spark):
    from ptt_spider_go_spark.pipeline import textstats

    docs = spark.createDataFrame(
        [
            (1, "common rare rare", "en"),
            (2, "common other", "en"),
            (3, "common", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    rows = textstats.tfidf_topk(docs, k=2).collect()
    top = {(r["doc_id"], r["rnk"]): (r["tok"], r["score_micro"]) for r in rows}
    # idf(common) = ln(4/4) = 0; idf(rare) = ln(4/2); tf(rare in doc1) = 2
    assert top[(1, 1)] == ("rare", 2 * round(math.log(2.0) * 1_000_000))
    # zero-score ties rank alphabetically
    assert top[(3, 1)][0] == "common" and top[(3, 1)][1] == 0
    # doc 2: 'other' (idf ln(2)) beats 'common' (idf 0)
    assert top[(2, 1)][0] == "other"


def test_dsir_prefers_target_like_docs(spark):
    """Raw docs whose tokens match the target domain outrank junk:
    with keep_frac=0.5 over four raw docs in one language, the two
    target-vocabulary docs are kept and the junk is not. Target docs
    never appear in the output."""
    rows = [
        # target domain (source='src0'): clean vocabulary
        (1, "alpha beta gamma alpha beta", "en", "src0"),
        (2, "alpha gamma beta beta alpha", "en", "src0"),
        # raw pool
        (10, "alpha beta gamma beta", "en", "web"),   # target-like
        (11, "beta alpha alpha gamma", "en", "web"),  # target-like
        (12, "zzz qqq xxx www", "en", "web"),         # junk
        (13, "qqq zzz www xxx", "en", "web"),         # junk
    ]
    docs = spark.createDataFrame(
        [(i, t, lg, s) for i, t, lg, s in rows],
        "doc_id long, text string, lang string, source string",
    )
    got = {r["doc_id"]: r for r in lm.dsir_select(docs, keep_frac=0.5).collect()}
    assert set(got) == {10, 11, 12, 13}
    assert got[10]["keep"] and got[11]["keep"]
    assert not got[12]["keep"] and not got[13]["keep"]
    assert got[10]["lambda_micro"] > got[12]["lambda_micro"]


def test_dsir_empty_doc_and_tie_break(spark):
    """Token-less raw docs score lambda 0 (not dropped); equal-lambda
    ties keep the lower doc_id."""
    rows = [
        (1, "alpha beta", "en", "src0"),
        (10, "", "en", "web"),
        (11, "", "en", "web"),
        (12, "", "en", "web"),
        (13, "", "en", "web"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    got = {r["doc_id"]: r for r in lm.dsir_select(docs, keep_frac=0.25).collect()}
    assert all(got[d]["lambda_micro"] == 0 and got[d]["n_feat"] == 0
               for d in (10, 11, 12, 13))
    assert got[10]["keep"] and not any(got[d]["keep"] for d in (11, 12, 13))
