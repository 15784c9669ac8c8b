"""X127: benchmark-side contamination report
(dedup_text.eval_contamination).

Pins: short docs (< 13 tokens) contribute one all-tokens gram, so a
verbatim train copy burns the eval doc at 1,000,000 ppm; a 14-token
eval doc has two grams and a half-overlap lands exactly at 500,000
ppm (integer floor division, no float); unshared eval docs report 0;
the report is consistent with decontaminate (X26) — if any train doc
is contaminated, at least one eval doc is burned; and the result is
partitioning-invariant.
"""

from __future__ import annotations

from ptt_spider_go_spark.pipeline.dedup_text import (
    decontaminate,
    eval_contamination,
)


def _docs(spark, rows, parts=4):
    return spark.createDataFrame(
        rows, schema="doc_id long, text string"
    ).repartition(parts)


def test_verbatim_copy_burns_fully(spark):
    rows = [
        (0, "a b c"),            # eval (0 % 97 == 0)
        (5, "a b c"),            # train: verbatim copy
        (97, "x y z"),           # eval: unshared
        (6, "p q r"),
    ]
    got = {
        r["doc_id"]: (r["n_grams"], r["n_in_train"],
                      r["contamination_ppm"], r["is_burned"])
        for r in eval_contamination(_docs(spark, rows)).collect()
    }
    assert set(got) == {0, 97}          # eval docs only
    assert got[0] == (1, 1, 1_000_000, True)
    assert got[97] == (1, 0, 0, False)


def test_half_overlap_is_exact_integer_ppm(spark):
    # 14 tokens -> grams at offsets 0 and 1. The train doc reproduces
    # tokens 1..13 (gram at offset 0) but not the shifted gram.
    eval_toks = [f"e{i}" for i in range(14)]
    rows = [
        (0, " ".join(eval_toks)),
        (5, " ".join(eval_toks[:13])),   # train: first 13-gram only
    ]
    got = {
        r["doc_id"]: (r["n_grams"], r["n_in_train"], r["contamination_ppm"])
        for r in eval_contamination(_docs(spark, rows)).collect()
    }
    assert got[0] == (2, 1, 500_000)


def test_consistent_with_decontaminate(spark):
    rows = [
        (0, "the quick brown fox jumps"),
        (5, "prefix words the quick brown fox jumps suffix"),
        (6, "unrelated text entirely"),
        (97, "clean eval doc"),
    ]
    docs = _docs(spark, rows)
    train_dirty = {
        r["doc_id"]
        for r in decontaminate(docs).collect()
        if r["is_contaminated"]
    }
    burned = {
        r["doc_id"]
        for r in eval_contamination(docs).collect()
        if r["is_burned"]
    }
    # doc 5 contains eval doc 0's all-tokens gram? No — grams are
    # 13-grams (here all-tokens grams of each doc, which differ).
    # Overlap needs an IDENTICAL gram: short docs share a gram only
    # when the whole token sequence matches, so neither side fires.
    assert train_dirty == set() and burned == set()
    # Now add a verbatim leak: both directions must fire.
    rows2 = rows + [(7, "clean eval doc")]
    docs2 = _docs(spark, rows2)
    train_dirty2 = {
        r["doc_id"]
        for r in decontaminate(docs2).collect()
        if r["is_contaminated"]
    }
    burned2 = {
        r["doc_id"]
        for r in eval_contamination(docs2).collect()
        if r["is_burned"]
    }
    assert train_dirty2 == {7} and burned2 == {97}


def test_partitioning_invariant(spark):
    rows = [
        (i, " ".join(f"w{(i * 3 + j) % 17}" for j in range(15)))
        for i in range(200)
    ]
    a = eval_contamination(_docs(spark, rows, parts=1)).collect()
    b = eval_contamination(_docs(spark, rows, parts=9)).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
