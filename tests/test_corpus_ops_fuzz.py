"""Seeded-random batch golden-model fuzzers for the round-4 corpus
operators: one random corpus, one Spark pass per operator, exact
comparison against an independent pure-Python model (the same
one-job-many-examples pattern as test_property_parity.py — a Spark
round-trip per hypothesis example would be pathologically slow).

The vocabulary is deliberately tiny (12 tokens) so overlapping
10-token windows genuinely collide across random docs, exercising the
excision/duplication machinery on non-crafted inputs."""

import hashlib
import math
import random

import pytest

from ptt_spider_go_spark.pipeline import dedup_text, textstats
from ptt_spider_go_spark.sinks import shards

SEED = 20260818
VOCAB = [f"w{i}" for i in range(12)]


@pytest.fixture(scope="module")
def corpus():
    rng = random.Random(SEED)
    rows = []
    for i in range(120):
        n = rng.randrange(0, 30)
        rows.append((i, " ".join(rng.choice(VOCAB) for _ in range(n)),
                     rng.choice(["en", "de"]), f"src{i % 5}"))
    # verbatim duplicates to guarantee full-window collisions
    for j in range(10):
        rows.append((200 + j, rows[j][1], rows[j][2], rows[j][3]))
    return rows


@pytest.fixture(scope="module")
def corpus_df(spark, corpus):
    return spark.createDataFrame(
        corpus, "doc_id long, text string, lang string, source string")


def _toks(text):
    return [t for t in text.split() if t]


def test_excise_fuzz_vs_python_model(spark, corpus, corpus_df):
    k = 10
    wins = {}
    for doc_id, text, _l, _s in corpus:
        toks = _toks(text)
        for s in range(len(toks) - k + 1):
            wins.setdefault(" ".join(toks[s:s + k]), []).append((doc_id, s))
    covered = {}
    for occ in wins.values():
        if len(occ) >= 2:
            for doc_id, s in occ:
                covered.setdefault(doc_id, set()).update(range(s, s + k))
    expect = {}
    for doc_id, text, _l, _s in corpus:
        toks = _toks(text)
        keep = [t for p, t in enumerate(toks)
                if p not in covered.get(doc_id, ())]
        expect[doc_id] = (" ".join(keep), len(toks), len(toks) - len(keep))
    got = {r["doc_id"]: (r["clean_text"], r["n_tokens"],
                         r["n_removed_tokens"])
           for r in dedup_text.excise_dup_substrings(corpus_df).collect()}
    assert got == expect
    # the tiny vocab must actually exercise the removal path
    assert any(v[2] > 0 for v in expect.values())


def test_chunk_fuzz_reassembles(spark, corpus, corpus_df):
    c = 7
    got = {}
    for r in textstats.chunk_documents(corpus_df, context_tokens=c).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["n_tokens"], r["chunk_text"]))
    for doc_id, text, _l, _s in corpus:
        toks = _toks(text)
        chunks = sorted(got.get(doc_id, []))
        assert len(chunks) == math.ceil(len(toks) / c)
        # ordered reassembly is the identity; sizes are C,...,C,ragged
        assert " ".join(t for _i, _n, t in chunks) == " ".join(toks)
        assert [n for _i, n, _t in chunks] == [
            min(c, len(toks) - i * c) for i in range(len(chunks))]


def test_mixture_fuzz_vs_python_model(spark, corpus, corpus_df):
    nt = {d: len(_toks(t)) for d, t, _l, _s in corpus}
    sources = {}
    for d, _t, _l, s in corpus:
        sources.setdefault(s, []).append(d)
    alloc = (sum(nt.values()) // 2) // len(sources)
    expect = set()
    for s, ds in sources.items():
        ds.sort(key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d))
        cum = 0
        for d in ds:
            cum += nt[d]
            if cum <= alloc:
                expect.add((d, s, nt[d], cum))
    got = {(r["doc_id"], r["source"], r["n_tokens"], r["cum_tokens"])
           for r in textstats.mixture_sample(corpus_df).collect()}
    assert got == expect


def test_classifier_fuzz_vs_python_model(spark, corpus, corpus_df):
    def w(f):
        return int(hashlib.md5(f"w:{f}".encode()).hexdigest()[:15],
                   16) % 2001 - 1000

    got = {r["doc_id"]: r
           for r in textstats.classifier_scores(corpus_df).collect()}
    for doc_id, text, _l, _s in corpus:
        toks = _toks(text)
        feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        r = got[doc_id]
        assert r["n_features"] == len(feats)
        si = sum(w(f) for f in feats)
        assert r["keep"] == (si > 0)
        assert r["score"] == (round(si / (1000.0 * len(feats)), 4)
                              if feats else 0.0)


def test_shard_assign_fuzz_vs_python_model(spark, corpus, corpus_df):
    st = 40
    nt = {d: len(_toks(t)) for d, t, _l, _s in corpus}
    langs = {}
    for d, _t, l, _s in corpus:
        langs.setdefault(l, []).append(d)
    expect = {}
    for l, ds in langs.items():
        ds.sort(key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d))
        cum = 0
        for d in ds:
            expect[d] = (l, nt[d], cum // st)
            cum += nt[d]
    got = {r["doc_id"]: (r["lang"], r["n_tokens"], r["shard_id"])
           for r in shards.assign_shards(corpus_df, shard_tokens=st).collect()}
    assert got == expect


def test_wet_fuzz_roundtrip(spark, tmp_path_factory):
    """Random unicode bodies — including newlines, WET header syntax,
    blank lines, and astral-plane chars — round-trip byte-exactly."""
    from ptt_spider_go_spark.sources import wet

    rng = random.Random(SEED)
    alphabet = list("ab \n:饕餮🦀") + ["WET/1.0\n", "Record-ID: 7\n", "\n\n"]
    rows = []
    for i in range(200):
        body = "".join(rng.choice(alphabet)
                       for _ in range(rng.randrange(0, 40)))
        rows.append((i, rng.choice(["en", "zh"]), f"s{i % 7}", body))
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string")
    path = str(tmp_path_factory.mktemp("wetfuzz") / "wet")
    wet.write_wet(docs, path, n_files=5)
    got = sorted(wet.read_wet(spark, path).collect(),
                 key=lambda r: r["doc_id"])
    assert [tuple(r) for r in got] == rows
