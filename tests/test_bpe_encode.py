"""X123: BPE tokenizer-apply (pipeline/bpe.py bpe_encode).

Pins the train/apply contract: encoding the training sample with the
learned merge list reproduces phrase_merges' own applied corpus
bit-for-bit; the greedy fold is the classic non-overlapping
left-to-right merge ('a a a' + (a,a) → ['a+a', 'a']); merge PRIORITY
(training order) changes the encoding, so the list is ordered, not a
set; the expression-depth checkpoint cadence never changes results;
and an empty model is the identity encode.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ptt_spider_go_spark.pipeline.bpe import bpe_encode, phrase_merges


def _docs(spark, texts, parts=3):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        schema="doc_id long, text string",
    ).repartition(parts)


def _enc(spark, texts, merges, **kw):
    out = bpe_encode(_docs(spark, texts), merges, **kw)
    return {
        r["doc_id"]: (r["n_in"], list(r["syms"]))
        for r in out.collect()
    }


def test_apply_reproduces_training_applied(spark):
    texts = [
        "the cat sat on the mat",
        "the cat ran to the cat",
        "a dog and the cat",
        "the cat the cat the cat",
    ]
    docs = _docs(spark, texts)
    table, applied = phrase_merges(docs, n_merges=3)
    merges = [
        (r["lhs"], r["rhs"]) for r in table.orderBy("step").collect()
    ]
    assert len(merges) == 3
    want = {
        r["doc_id"]: list(r["syms"]) for r in applied.collect()
    }
    got = {
        d: syms for d, (_n, syms) in _enc(spark, texts, merges).items()
    }
    assert got == want


def test_greedy_left_to_right_nonoverlapping(spark):
    got = _enc(spark, ["a a a", "a a a a"], [("a", "a")])
    assert got[0] == (3, ["a+a", "a"])
    assert got[1] == (4, ["a+a", "a+a"])


def test_merge_priority_order_matters(spark):
    text = ["x y z"]
    first = _enc(spark, text, [("x", "y"), ("x+y", "z")])
    assert first[0] == (3, ["x+y+z"])
    second = _enc(spark, text, [("y", "z"), ("x", "y")])
    assert second[0] == (3, ["x", "y+z"])


def test_checkpoint_cadence_is_invisible(spark):
    texts = ["p q r s p q", "q r s q r", "p q p q p q"]
    merges = [("p", "q"), ("r", "s"), ("p+q", "r+s"), ("q", "r")]
    a = _enc(spark, texts, merges, checkpoint_every=1)
    b = _enc(spark, texts, merges, checkpoint_every=100)
    assert a == b


def test_empty_model_is_identity(spark):
    texts = ["only tokens here", ""]
    got = _enc(spark, texts, [])
    assert got[0] == (3, ["only", "tokens", "here"])
    assert got[1] == (0, [])


def test_encode_is_map_only(spark):
    """The encode plan must not contain an Exchange — the whole point
    of the apply path is that it is embarrassingly parallel."""
    docs = spark.createDataFrame(
        [(0, "a b c d"), (1, "b c d a")], "doc_id long, text string"
    )  # no repartition: any Exchange in the plan would be the encode's
    plan = bpe_encode(docs, [("a", "b"), ("c", "d")])._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_n_out_counts_merge_events(spark):
    got = bpe_encode(
        _docs(spark, ["a b a b x", "a b"]), [("a", "b")]
    ).select(
        "doc_id", "n_in", F.size("syms").cast("long").alias("n_out")
    ).collect()
    by = {r["doc_id"]: (r["n_in"], r["n_out"]) for r in got}
    assert by[0] == (5, 3)  # two merge events
    assert by[1] == (2, 1)  # one merge event
