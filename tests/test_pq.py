"""X131: product quantization (pipeline/pq.py).

Pins: a pure-Python mirror of the full PQ pipeline (per-subspace
label-seeded two-round Lloyd, final codes under the post-round-2
codebooks, BIGINT reconstruction error) matches Spark bit-for-bit;
ADC distance equals the exact distance to the RECONSTRUCTED vector
(and exactly equals the true distance when the vector sits on its
centroids, qerr = 0); the ranking receipt is deterministic; a
non-divisible subspace count fails fast; and the whole run is
partitioning-invariant.
"""

from __future__ import annotations

import math

import pytest

from ptt_spider_go_spark.pipeline.kmeans import SCALE
from ptt_spider_go_spark.pipeline.pq import pq_adc_topk, pq_codes


def _edf(spark, rows, parts=4):
    return spark.createDataFrame(
        rows, schema="vec_id long, embedding array<float>, label int"
    ).repartition(parts)


def _train_mirror(quant, m, sub_d, n_iters=2):
    """Mirror of one subspace's codebook chain; returns sorted
    [(cid, centroid)] after n_iters rounds."""
    sub = [(vid, q[m * sub_d:(m + 1) * sub_d], lab) for vid, q, lab in quant]
    seeds = {}
    for vid, q, lab in sorted(sub):
        seeds.setdefault(lab, q)
    cents = sorted(seeds.items())
    for _ in range(n_iters):
        a = []
        for vid, q, _lab in sub:
            best = min(
                (sum((x - c) * (x - c) for x, c in zip(q, cv)), cid)
                for cid, cv in cents
            )
            a.append((q, best[1]))
        sums, counts = {}, {}
        for q, cid in a:
            counts[cid] = counts.get(cid, 0) + 1
            acc = sums.setdefault(cid, [0] * sub_d)
            for i, v in enumerate(q):
                acc[i] += v
        cents = sorted(
            (cid, [s // counts[cid] for s in sums[cid]]) for cid in sums
        )
    return cents


def _mirror_codes(rows, m_sub=4, n_iters=2):
    quant = [
        (vid, [math.floor(float(x) * SCALE) for x in emb], lab)
        for vid, emb, lab in rows
    ]
    d = len(quant[0][1])
    sub_d = d // m_sub
    books = [_train_mirror(quant, m, sub_d, n_iters) for m in range(m_sub)]
    out = []
    for vid, q, _lab in sorted(quant):
        codes, qerr = [], 0
        for m, cents in enumerate(books):
            sq = q[m * sub_d:(m + 1) * sub_d]
            best = min(
                (sum((x - c) * (x - c) for x, c in zip(sq, cv)), cid)
                for cid, cv in cents
            )
            codes.append(best[1])
            qerr += best[0]
        out.append((vid, *codes, qerr))
    return out


def test_codes_match_pure_python_mirror(spark):
    rows = [
        (i, [((i * 11 + d * 7) % 23 - 11) / 13.0 for d in range(8)], i % 3)
        for i in range(36)
    ]
    got = [tuple(r) for r in pq_codes(_edf(spark, rows)).collect()]
    assert got == _mirror_codes(rows)


def test_zero_qerr_makes_adc_exact(spark):
    # Vectors that ARE their subspace centroids reconstruct exactly:
    # qerr = 0 and ADC == exact for every query. One vector per label
    # with a distinct constant value => each label's singleton cluster
    # centroid is the vector itself (floor-mean of one member).
    rows = [(i, [float(i)] * 8, i) for i in range(3)] + [
        (97, [0.5] * 8, 0)  # the query (97 % 97 == 0)
    ]
    codes = {r["vec_id"]: r["qerr"] for r in pq_codes(_edf(spark, rows)).collect()}
    adc = pq_adc_topk(_edf(spark, rows), k=3).collect()
    assert len(adc) == 6          # vec 0 and vec 97 both hold the query rule
    for r in adc:
        if codes[r["vec_id"]] == 0:
            assert r["adc_d2"] == r["exact_d2"]


def test_adc_is_distance_to_reconstruction(spark):
    rows = [
        (i, [((i * 5 + d * 3) % 17 - 8) / 7.0 for d in range(8)], i % 2)
        for i in range(20)
    ] + [(97, [0.1] * 8, 0)]
    quant = [
        (vid, [math.floor(float(x) * SCALE) for x in emb], lab)
        for vid, emb, lab in rows
    ]
    sub_d = 2
    books = [_train_mirror(quant, m, sub_d) for m in range(4)]
    qv = dict((vid, q) for vid, q, _ in quant)[97]
    recon = {}
    for vid, q, _lab in quant:
        r = []
        for m, cents in enumerate(books):
            sq = q[m * sub_d:(m + 1) * sub_d]
            best = min(
                (sum((x - c) * (x - c) for x, c in zip(sq, cv)), cid)
                for cid, cv in cents
            )
            r.extend(dict(cents)[best[1]])
        recon[vid] = r
    got = pq_adc_topk(_edf(spark, rows), k=20).collect()
    assert got, "query 97 must produce rows"
    for r in got:
        if r["q_id"] == 97:
            expect = sum(
                (a - b) * (a - b) for a, b in zip(qv, recon[r["vec_id"]])
            )
            assert r["adc_d2"] == expect


def test_bad_subspace_count_fails_fast(spark):
    rows = [(i, [0.1] * 6, i % 2) for i in range(4)]
    with pytest.raises(AssertionError):
        pq_codes(_edf(spark, rows), m_subspaces=4).collect()


def test_partitioning_invariant(spark):
    rows = [
        (i, [((i * 13 + d * 5) % 19 - 9) / 11.0 for d in range(8)], i % 3)
        for i in range(60)
    ]
    a = [tuple(r) for r in pq_codes(_edf(spark, rows, 1)).collect()]
    b = [tuple(r) for r in pq_codes(_edf(spark, rows, 9)).collect()]
    assert a == b


def test_ivf_pq_scores_only_probed_cells(spark):
    from ptt_spider_go_spark.pipeline.pq import ivf_pq_topk

    # 3 cells; the query (97, label 0) sits on cell 0's centroid, so
    # n_probe=1 must admit ONLY cell-0 vectors.
    rows = (
        [(i, [0.0 + i / 100.0] * 8, 0) for i in range(1, 5)]
        + [(10 + i, [5.0 + i / 100.0] * 8, 1) for i in range(4)]
        + [(20 + i, [9.0 + i / 100.0] * 8, 2) for i in range(4)]
        + [(97, [0.005] * 8, 0)]
    )
    got = ivf_pq_topk(_edf(spark, rows), k=10, n_probe=1).collect()
    assert got and all(r["cell"] == 0 for r in got)
    # every cell-0 vector except the query itself is scored
    assert {r["vec_id"] for r in got} == {1, 2, 3, 4}


def test_ivf_pq_subset_of_full_adc(spark):
    from ptt_spider_go_spark.pipeline.pq import ivf_pq_topk, pq_adc_topk

    rows = [
        (i, [((i * 13 + d * 5) % 19 - 9) / 11.0 for d in range(8)], i % 3)
        for i in range(60)
    ]
    full = {
        (r["q_id"], r["vec_id"]): r["adc_d2"]
        for r in pq_adc_topk(_edf(spark, rows), k=60).collect()
    }
    ivf = ivf_pq_topk(_edf(spark, rows), k=5, n_probe=3).collect()
    # n_probe = all cells -> the composed search agrees with full ADC
    # on every returned (pair, distance).
    for r in ivf:
        assert full[(r["q_id"], r["vec_id"])] == r["adc_d2"]
