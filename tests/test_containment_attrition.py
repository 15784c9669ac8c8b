"""X128 containment_pairs + X129 dedup_attrition.

Containment pins: a verbatim quote (B ⊂ A) scores cont_b_ppm =
1,000,000 while its Jaccard is far below any usable threshold (the
capability Jaccard-based near-dup misses); the either-direction
filter; exact floor-division ppm (no float); the bucket bound; and
partitioning invariance.

Attrition pins: keeper = min doc_id attributes every non-keeper's
docs and tokens to the keeper's source, including the intra-source
row; unique docs appear nowhere; a dup-free corpus yields an empty
matrix; and partitioning invariance.
"""

from __future__ import annotations

from ptt_spider_go_spark.pipeline.dedup_text import (
    containment_pairs,
    ngram_jaccard_pairs,
)
from ptt_spider_go_spark.pipeline.report import dedup_attrition


def _docs(spark, rows, parts=4, schema="doc_id long, text string, lang string"):
    return spark.createDataFrame(rows, schema=schema).repartition(parts)


def test_quote_detected_containment_not_jaccard(spark):
    # doc 2 is a 4-token verbatim quote of doc 1's 40 distinct tokens:
    # C(2 in 1) = 1.0 but J = 4/40 = 0.1.
    big = " ".join(f"w{i}" for i in range(40))
    rows = [(1, big, "en"), (2, "w3 w4 w5 w6", "en")]
    got = containment_pairs(_docs(spark, rows), threshold_ppm=950_000).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert r["common"] == 4 and r["sz_a"] == 40 and r["sz_b"] == 4
    assert r["cont_b_ppm"] == 1_000_000
    assert r["cont_a_ppm"] == 100_000          # 4/40, exact
    jac = ngram_jaccard_pairs(_docs(spark, rows), threshold=0.4).collect()
    assert jac == []                            # Jaccard is blind to it


def test_floor_division_exact(spark):
    # common=2 of sz=3 -> floor(2e6/3) = 666666 (never 666667).
    rows = [(1, "a b c", "en"), (2, "a b z", "en")]
    got = containment_pairs(_docs(spark, rows), threshold_ppm=600_000).collect()
    assert len(got) == 1
    assert got[0]["cont_a_ppm"] == 666_666 == got[0]["cont_b_ppm"]


def test_bucket_bounds_pairs(spark):
    rows = [(1, "a b c", "en"), (2, "a b c", "de")]
    assert containment_pairs(_docs(spark, rows), threshold_ppm=1).collect() == []


def test_either_direction_emits(spark):
    # only the small side clears 0.9; the pair must still be emitted.
    big = " ".join(f"t{i}" for i in range(30))
    rows = [(1, big, "en"), (2, "t0 t1", "en")]
    got = containment_pairs(_docs(spark, rows), threshold_ppm=900_000).collect()
    assert len(got) == 1 and got[0]["cont_b_ppm"] == 1_000_000
    assert got[0]["cont_a_ppm"] < 900_000


def test_containment_partitioning_invariant(spark):
    rows = [
        (i, " ".join(f"w{(i * 5 + j) % 31}" for j in range(12)), f"l{i % 3}")
        for i in range(90)
    ]
    a = sorted(map(tuple, containment_pairs(_docs(spark, rows, 1)).collect()))
    b = sorted(map(tuple, containment_pairs(_docs(spark, rows, 9)).collect()))
    assert a == b


def _srcdocs(spark, rows, parts=4):
    return spark.createDataFrame(
        rows, schema="doc_id long, source string, text string"
    ).repartition(parts)


def test_attrition_matrix_hand_fixture(spark):
    rows = [
        (1, "A", "x y z"),        # keeper of the 'x y z' group
        (2, "B", "x y z"),        # B loses 3 tokens to A
        (3, "B", "x y z"),        # B loses 3 more to A
        (4, "A", "p q"),          # keeper of the 'p q' group
        (5, "A", "p q"),          # intra-source: A loses 2 to A
        (6, "C", "unique text here"),   # unique: appears nowhere
    ]
    got = {
        (r["keeper_source"], r["loser_source"]):
            (r["n_docs_lost"], r["tokens_lost"])
        for r in dedup_attrition(_srcdocs(spark, rows)).collect()
    }
    assert got == {("A", "B"): (2, 6), ("A", "A"): (1, 2)}


def test_attrition_empty_when_no_dups(spark):
    rows = [(1, "A", "a"), (2, "B", "b"), (3, "C", "c")]
    assert dedup_attrition(_srcdocs(spark, rows)).collect() == []


def test_attrition_keeper_is_min_id_across_sources(spark):
    # the SAME text in three sources: keeper is doc 10 (source C),
    # so C gains and A/B lose — order of arrival is irrelevant.
    rows = [(30, "A", "t t t"), (20, "B", "t t t"), (10, "C", "t t t")]
    got = {
        (r["keeper_source"], r["loser_source"]):
            (r["n_docs_lost"], r["tokens_lost"])
        for r in dedup_attrition(_srcdocs(spark, rows)).collect()
    }
    assert got == {("C", "A"): (1, 3), ("C", "B"): (1, 3)}


def test_attrition_partitioning_invariant(spark):
    rows = [
        (i, f"s{i % 4}", f"text {i % 13} body")
        for i in range(150)
    ]
    a = dedup_attrition(_srcdocs(spark, rows, 1)).collect()
    b = dedup_attrition(_srcdocs(spark, rows, 9)).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_containment_bitset_naive_equivalence(spark):
    from ptt_spider_go_spark.pipeline.dedup_text import (
        containment_pairs_bitset,
        containment_pairs_naive,
    )

    rows = [
        (i, " ".join(f"w{(i * 5 + j) % 31}" for j in range(12)), f"l{i % 3}")
        for i in range(90)
    ] + [(900, "w1 w6 w11", "l0"), (901, "", "l1")]
    docs = _docs(spark, rows)
    for t in (1, 600_000, 950_000):
        a = sorted(map(tuple, containment_pairs_naive(docs, t).collect()))
        b = sorted(map(tuple, containment_pairs_bitset(docs, t).collect()))
        assert a == b
