"""Seeded-random batch parity fuzzers: every scalar that exists both as
a Catalyst column expression (functions/columns.py, the distributed hot
path) and as pure Python (htmlparse/, used inside the parse kernels)
must agree on adversarial inputs — the cross-implementation twin of the
reference's table-driven tests (ptt/parser_impl_test.go,
fileutil/filename_test.go, crawler/retry_test.go).

One Spark job per function over a few hundred seeded-random inputs
(not per-example hypothesis runs — a Spark round-trip per example would
be pathologically slow)."""

import datetime as dt
import random

from pyspark.sql import functions as F

from ptt_spider_go_spark.functions import columns as C
from ptt_spider_go_spark.htmlparse import files as PF
from ptt_spider_go_spark.htmlparse import ptt as PP

SEED = 20260817


def _col_vs_python(spark, inputs, col_builder, py_fn):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(inputs)], "i long, s string"
    )
    got = {
        r["i"]: r["v"]
        for r in df.select("i", col_builder(F.col("s")).alias("v")).collect()
    }
    for i, s in enumerate(inputs):
        assert got[i] == py_fn(s), repr(s)


def _rand_strings(rng, alphabet, n=400, maxlen=12):
    return [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(maxlen)))
        for _ in range(n)
    ]


def test_push_rate_decode_parity_fuzz(spark):
    rng = random.Random(SEED)
    # 　 (full-width space), \xa0 (NBSP), \x85 (NEL): Unicode
    # whitespace Go's TrimSpace strips but ASCII-only \s does not
    # (ADVICE r2 — the gap was untested before these joined the
    # alphabet)
    alphabet = "0123456789Xx爆+- \t普　\xa0\x85"
    inputs = _rand_strings(rng, alphabet) + [
        "爆", "X", "XX", "+5", "-0", " 爆 ",
        "　99　", "\xa0X5\xa0", "　爆", "\x85 7",
    ]
    _col_vs_python(spark, inputs, C.push_rate_decode, PP.decode_push_rate)


def test_ws_trim_exact_go_set(spark):
    """ws_trim strips exactly GO_WHITESPACE: every member goes, and
    near-miss non-members (U+001C, which bare Python str.strip() DOES
    strip but Go does not; U+200B zero-width space) stay."""
    members = [f"{ch}a{ch}" for ch in PP.GO_WHITESPACE]
    non = ["\x1ca\x1c", "\u200ba\u200b"]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(members + non)], "i long, s string"
    )
    got = {
        r["i"]: r["v"]
        for r in df.select("i", C.ws_trim(F.col("s")).alias("v")).collect()
    }
    for i, s in enumerate(members):
        assert got[i] == "a", repr(s)
        assert PP.trim_space(s) == "a", repr(s)
    for j, s in enumerate(non, start=len(members)):
        assert got[j] == s, repr(s)
        assert PP.trim_space(s) == s, repr(s)


def test_normalize_img_href_parity_fuzz(spark):
    rng = random.Random(SEED + 1)
    parts = ["http://", "https://", "//", "", "imgur.com/", "imgur.com/a/",
             "x.test/", "img", ".jpg", ".jpeg", ".png", ".gif", ".txt", "/a"]
    inputs = [
        "".join(rng.choice(parts) for _ in range(rng.randrange(1, 5)))
        for _ in range(400)
    ]
    _col_vs_python(spark, inputs, C.normalize_img_href, PP.normalize_img_href)


def test_image_file_name_parity_fuzz(spark):
    rng = random.Random(SEED + 2)
    parts = ["https://a.test", "https://imgur.com", "/x", "/y.z", "//",
             "/noext", "?q=1", "#f", ".jpg", "/"]
    inputs = [
        "https://a.test" + "".join(rng.choice(parts[2:])
                                   for _ in range(rng.randrange(4)))
        for _ in range(200)
    ] + [
        "https://imgur.com" + "".join(rng.choice(parts[2:])
                                      for _ in range(rng.randrange(4)))
        for _ in range(200)
    ]
    _col_vs_python(spark, inputs, C.image_file_name, PF.image_file_name)


def test_clean_file_name_parity_fuzz(spark):
    rng = random.Random(SEED + 3)
    inputs = _rand_strings(rng, 'ab/\\:*?"<>|. 爆')
    _col_vs_python(spark, inputs, C.clean_file_name, PF.clean_file_name)


def _py_retry_after_delay_ms(ra, attempt, now):
    """Reference semantics twin (crawler/retry.go:57-93) in pure Python."""
    import re

    if ra is not None:
        if re.fullmatch(r"[+-]?[0-9]+", ra):
            sec = int(ra)
            if sec > 0:
                return min(sec * 1000, 30000)
            # non-positive integer: Go's date parse then fails -> expo
        else:
            try:
                t = dt.datetime.strptime(ra, "%a, %d %b %Y %H:%M:%S GMT")
                delay = int((t - now).total_seconds()) * 1000
                if delay <= 0:
                    return 1000
                return min(delay, 30000)
            except ValueError:
                pass
    return min(1000 * 2 ** (attempt - 1), 30000)


def test_retry_after_delay_parity_fuzz(spark):
    rng = random.Random(SEED + 4)
    now = dt.datetime(2026, 1, 1, 0, 0, 0)
    inputs = []
    for _ in range(300):
        kind = rng.randrange(5)
        if kind == 0:
            inputs.append(str(rng.randrange(-100, 100)))
        elif kind == 1:
            t = now + dt.timedelta(seconds=rng.randrange(-4000, 4000))
            inputs.append(t.strftime("%a, %d %b %Y %H:%M:%S GMT"))
        elif kind == 2:
            inputs.append("".join(rng.choice("abc 123,:") for _ in range(8)))
        elif kind == 3:
            inputs.append(None)
        else:
            inputs.append("+" + str(rng.randrange(0, 50)))
    attempts = [rng.randrange(1, 4) for _ in inputs]
    df = spark.createDataFrame(
        list(zip(range(len(inputs)), inputs, attempts)),
        "i long, ra string, attempt int",
    )
    got = {
        r["i"]: r["v"]
        for r in df.select(
            "i",
            C.retry_after_delay_ms(
                F.col("ra"), F.col("attempt"),
                F.lit("2026-01-01 00:00:00").cast("timestamp"),
            ).alias("v"),
        ).collect()
    }
    for i, (ra, att) in enumerate(zip(inputs, attempts)):
        assert got[i] == _py_retry_after_delay_ms(ra, att, now), (ra, att)


def test_jaccard_naive_equals_prefix_random_corpus(spark):
    """Algorithm equivalence on a seeded random corpus (not just the
    curated fixture): identical pair sets from both exact algorithms."""
    from ptt_spider_go_spark.pipeline import dedup_text

    rng = random.Random(SEED + 5)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for i in range(80):
        k = rng.randrange(3, 12)
        rows.append((i, " ".join(rng.sample(vocab, k)), "en"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    naive = sorted(map(tuple, dedup_text.ngram_jaccard_pairs(docs).collect()))
    pref = sorted(map(tuple,
                      dedup_text.ngram_jaccard_pairs_prefix(docs).collect()))
    assert naive == pref and len(naive) > 0
