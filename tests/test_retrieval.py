"""X120: BM25 top-k retrieval over a distributed inverted index.

Pins the contract `pipeline/retrieval.py` rests on: scores match a
pure-Python BM25 mirror bit-for-bit (same integer micro-nat rounding
discipline as pipeline/lm.py), a verbatim copy of the query document
ranks first, the query document itself is never returned, ranks are
dense 1..k with the doc_id tiebreak, empty/whitespace queries yield no
rows, and the physical plan never funnels through a single partition
(the top-k window is PARTITIONED by q_id; the query side broadcasts).
"""

from __future__ import annotations

import math
import re

from pyspark.sql import functions as F

from ptt_spider_go_spark.pipeline.retrieval import (
    bm25_index,
    bm25_topk,
    query_terms,
)

_WS = re.compile(r"\s+")


def _toks(text: str) -> list[str]:
    return [t for t in _WS.split(text.strip()) if t]


def _mirror(docs: dict[int, str], k: int = 5, modulus: int = 97,
            first_k: int = 8) -> list[tuple[int, int, int, int]]:
    """Pure-Python BM25 twin: same postings/df/dl relations, same
    single idf rounding at the distinct-term level, same exact BIGINT
    tf rational 22·tf·S / (10·tf·S + 3·S + 9·dl·N), same tiebreak."""
    toked = {d: _toks(t) for d, t in docs.items()}
    lens = {d: len(ts) for d, ts in toked.items()}
    n = len(docs)
    s = sum(lens.values())
    df: dict[str, int] = {}
    tf: dict[tuple[str, int], int] = {}
    for d, ts in toked.items():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
        for t in ts:
            tf[(t, d)] = tf.get((t, d), 0) + 1
    idf = {
        t: round(math.log((2 * n + 2) / (2 * c + 1)) * 1_000_000)
        for t, c in df.items()
    }
    out = []
    for q in sorted(docs):
        if q % modulus != 0:
            continue
        qterms = {t for t in toked[q][:first_k]}
        scores: dict[int, int] = {}
        for d in docs:
            if d == q:
                continue
            sc = 0
            hit = False
            for t in qterms:
                f = tf.get((t, d))
                if not f:
                    continue
                hit = True
                comp = (22 * f * s) / (10 * f * s + 3 * s + 9 * lens[d] * n)
                sc += int(round(idf[t] * comp))
            if hit:
                scores[d] = sc
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        for r, (d, sc) in enumerate(ranked[:k], start=1):
            out.append((q, r, d, sc))
    return out


def _df(spark, docs: dict[int, str]):
    return spark.createDataFrame(
        [(d, t) for d, t in docs.items()], "doc_id long, text string"
    )


def _corpus() -> dict[int, str]:
    """Deterministic 40-doc corpus, two query docs (0 and 97): doc 0's
    text is copied verbatim at doc 11 (must rank first), topic words
    shared in graded amounts, one stopword-ish term in every doc."""
    docs = {}
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    for i in range(1, 110, 3):  # 1,4,...,109 -> includes 97
        w = words[i % len(words)]
        docs[i] = f"the {w} " + " ".join(
            words[(i + j) % len(words)] for j in range(i % 7)
        )
    docs[0] = "the alpha beta gamma"
    docs[11] = docs[0]
    docs[97] = "the zeta epsilon"
    docs[14] = ""  # empty doc: contributes nothing, breaks nothing
    return docs


def test_matches_pure_python_mirror(spark):
    docs = _corpus()
    got = [
        (r["q_id"], r["rank"], r["doc_id"], r["score_micro"])
        for r in bm25_topk(_df(spark, docs), k=5)
        .orderBy("q_id", "rank").collect()
    ]
    assert got == _mirror(docs, k=5)


def test_verbatim_copy_ranks_first_and_query_excluded(spark):
    docs = _corpus()
    rows = bm25_topk(_df(spark, docs), k=5).collect()
    by_q = {}
    for r in rows:
        assert r["doc_id"] != r["q_id"]
        by_q.setdefault(r["q_id"], {})[r["rank"]] = r["doc_id"]
    assert by_q[0][1] == 11  # the verbatim duplicate of doc 0
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_empty_query_doc_yields_no_rows(spark):
    docs = {0: "   ", 1: "alpha beta", 2: "beta gamma"}
    assert bm25_topk(_df(spark, docs), k=3).count() == 0


def test_index_relations_consistent(spark):
    docs = _corpus()
    idx = bm25_index(_df(spark, docs))
    assert idx["n_docs"] == len(docs)
    assert idx["sum_dl"] == sum(len(_toks(t)) for t in docs.values())
    # df(term) == number of distinct docs holding the term
    post = idx["postings"].groupBy("term").agg(
        F.count("*").alias("n")).collect()
    dfs = {r["term"]: r["df"] for r in idx["dfs"].collect()}
    assert {r["term"]: r["n"] for r in post} == dfs


def test_query_terms_first_k_window(spark):
    docs = {0: " ".join(f"w{i}" for i in range(20)), 1: "w0 w1"}
    qt = {(r["q_id"], r["term"])
          for r in query_terms(_df(spark, docs), first_k=8).collect()}
    assert qt == {(0, f"w{i}") for i in range(8)}


def test_no_single_partition_funnel(spark):
    docs = _corpus()
    plan = bm25_topk(_df(spark, docs), k=5)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange SinglePartition" not in plan
