"""X116: the dataset card. Hand-computed fixture pins every metric's
definitional rule, including the branches the synthetic gate corpus
leaves at zero (duplicates, gopher passes)."""

from __future__ import annotations

from ptt_spider_go_spark.pipeline.report import dataset_card

# 60 words, all alphabetic, mean word len 5.0 in [3,10], two distinct
# Gopher stopwords ('the', 'and'), no '#'/'...' symbols -> passes.
_GOOD = ("the quick brown foxes jumped over lazy sleeping dogs and "
         + "manner " * 50).strip()


def _card(spark, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, text string")
    return {r["metric"]: r["value"] for r in dataset_card(df).collect()}


def test_card_metrics_hand_computed(spark):
    rows = [
        (1, "en", _GOOD),          # gopher-passing
        (2, "en", "alpha beta"),   # 2 tokens, 10 chars
        (3, "zh", "alpha beta"),   # exact duplicate of doc 2's text
        (4, "zh", "gamma"),        # 1 token, 5 chars
    ]
    got = _card(spark, rows)
    n_good_toks = len(_GOOD.split())
    assert got["n_docs"] == 4
    assert got["total_chars"] == len(_GOOD) + 10 + 10 + 5
    assert got["total_tokens"] == n_good_toks + 2 + 2 + 1
    assert got["n_langs"] == 2
    assert got["tokens_en"] == n_good_toks + 2
    assert got["tokens_zh"] == 3
    assert got["exact_dup_docs"] == 1          # docs 2 and 3 share text
    assert got["dup_rate_ppm"] == 1_000_000 // 4
    assert got["gopher_pass_ppm"] == 1_000_000 // 4
    # distinct whitespace tokens across all texts
    vocab = set(_GOOD.split()) | {"alpha", "beta", "gamma"}
    assert got["distinct_tokens"] == len(vocab)
    # rank rule: lengths sorted [5, 10, 10, len(_GOOD)];
    # p50 -> rank ceil(.5*4)=2 -> 10; p90 -> rank 4 -> len(_GOOD)
    assert got["len_p50"] == 10
    assert got["len_p90"] == len(_GOOD)


def test_card_empty_corpus(spark):
    got = _card(spark, [])
    assert got == {
        "n_docs": 0, "total_chars": 0, "total_tokens": 0, "n_langs": 0,
    }


def test_card_quantiles_follow_min_rank_rule(spark):
    # lengths 1..10 (one doc each): p50 -> rank 5 -> value 5;
    # p90 -> rank 9 -> value 9
    rows = [(i, "en", "x" * i) for i in range(1, 11)]
    got = _card(spark, rows)
    assert got["len_p50"] == 5
    assert got["len_p90"] == 9
