"""X144: planted-relevant BM25 retrieval eval (pipeline/retrieval.py).

Pins: on a fixture of mutually-dissimilar documents the planted
truncated copy is retrieved at rank 1 for every query (hits_at_1 ==
n_queries, mrr_ppm == 1,000,000); the planted ids can never enter
the query holdout (offset residue pin); the integer-exact MRR
arithmetic matches a hand mirror when ranks vary; an empty holdout
degenerates to a zero receipt; partitioning-invariant.
"""

from __future__ import annotations

from ptt_spider_go_spark.pipeline.retrieval import (
    EVAL_OFFSET,
    bm25_eval,
    bm25_topk,
)
from pyspark.sql import functions as F

SCHEMA = "doc_id long, text string"


def _docs(spark, rows, parts=4):
    return spark.createDataFrame(rows, schema=SCHEMA).repartition(parts)


def _distinct_doc(i):
    words = [f"w{i}x{j}" for j in range(20)]
    return " ".join(words)


def test_offset_never_queries():
    assert EVAL_OFFSET % 97 != 0


def test_distinct_corpus_perfect_retrieval(spark):
    rows = [(i * 97, _distinct_doc(i)) for i in range(4)]
    rows += [(i * 97 + 1, _distinct_doc(100 + i)) for i in range(8)]
    got = bm25_eval(_docs(spark, rows)).collect()[0]
    assert got["n_queries"] == 4
    assert got["hits_at_1"] == 4 and got["hits_at_5"] == 4
    assert got["mrr_ppm"] == 1_000_000


def test_metric_arithmetic_matches_topk(spark):
    rows = [(i * 97, _distinct_doc(i)) for i in range(3)]
    rows += [(i * 97 + 1, _distinct_doc(50 + i)) for i in range(6)]
    docs = _docs(spark, rows)
    holdout = docs.filter(F.col("doc_id") % 97 == 0)
    from ptt_spider_go_spark.pipeline.common import tokens
    planted = holdout.select(
        tokens(F.col("text")).alias("toks"), "doc_id"
    ).select(
        (F.col("doc_id") + EVAL_OFFSET).alias("doc_id"),
        F.array_join(
            F.expr("slice(toks, 1, greatest((3 * size(toks)) DIV 5, 1))"),
            " ",
        ).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(planted)
    ranks = {
        r["q_id"]: r["rank"]
        for r in bm25_topk(corpus, k=5).collect()
        if r["doc_id"] == r["q_id"] + EVAL_OFFSET
    }
    qids = [r["doc_id"] for r in holdout.collect()]
    want_mrr = sum(
        1_000_000 // ranks[q] for q in qids if q in ranks
    ) // len(qids)
    got = bm25_eval(docs).collect()[0]
    assert got["mrr_ppm"] == want_mrr
    assert got["hits_at_5"] == len(ranks)
    assert got["hits_at_1"] == sum(1 for r in ranks.values() if r == 1)


def test_empty_holdout(spark):
    rows = [(1, "no holdout docs here"), (2, "none at all")]
    got = bm25_eval(_docs(spark, rows)).collect()[0]
    assert got["n_queries"] == 0
    assert got["hits_at_1"] == 0 and got["hits_at_5"] == 0


def test_partitioning_invariance(spark):
    rows = [(i * 97, _distinct_doc(i)) for i in range(3)]
    rows += [(i * 97 + 2, _distinct_doc(30 + i)) for i in range(6)]
    a = bm25_eval(_docs(spark, rows, 2)).collect()[0]
    b = bm25_eval(_docs(spark, rows, 7)).collect()[0]
    assert tuple(a) == tuple(b)
