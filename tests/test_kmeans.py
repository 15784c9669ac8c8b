"""X121: exact-integer Lloyd k-means (pipeline/kmeans.py).

Pins the exactness contract the oracle relies on: a pure-Python
mirror of the full quantize → seed → (assign, update)² → report loop
matches Spark bit-for-bit on synthetic vectors; assignment breaks
distance ties on the lower cid; the M-step mean is the exact floor
mean (including negative sums, where floor ≠ truncation); empty
clusters drop out of the model; and the whole run is deterministic
across partitionings.
"""

from __future__ import annotations

import math

from ptt_spider_go_spark.pipeline.kmeans import (
    SCALE,
    assign,
    kmeans_clusters,
    quantize,
    seed_centroids,
    update,
)


def _edf(spark, rows, parts=4):
    return spark.createDataFrame(
        rows, schema="vec_id long, embedding array<float>, label int"
    ).repartition(parts)


def _mirror(rows, n_iters=2):
    """Pure-Python twin of kmeans_clusters: same floor quantization,
    same (dist, cid) argmin, same floor-mean M-step, same report."""
    quant = [
        (vid, [math.floor(float(x) * SCALE) for x in emb], lab)
        for vid, emb, lab in rows
    ]
    seeds = {}
    for vid, q, lab in sorted(quant):
        seeds.setdefault(lab, q)
    cents = sorted(seeds.items())
    a = None
    for _ in range(n_iters):
        a = []
        for vid, q, _lab in quant:
            best = min(
                (sum((qa - ca) * (qa - ca) for qa, ca in zip(q, c)), cid)
                for cid, c in cents
            )
            a.append((vid, q, best[1]))
        sums: dict[int, list[int]] = {}
        counts: dict[int, int] = {}
        for _vid, q, cid in a:
            counts[cid] = counts.get(cid, 0) + 1
            acc = sums.setdefault(cid, [0] * len(q))
            for i, v in enumerate(q):
                acc[i] += v
        cents = sorted(
            (cid, [s // counts[cid] for s in sums[cid]])
            for cid in sums
        )
    out = {}
    cmap = dict(cents)
    for _vid, q, cid in a:
        c = cmap[cid]
        d = sum((qa - ca) * (qa - ca) for qa, ca in zip(q, c))
        n, l1, w = out.get(cid, (0, sum(abs(v) for v in c), 0))
        out[cid] = (n + 1, l1, w + d)
    return sorted((cid, n, l1, w) for cid, (n, l1, w) in out.items())


def test_matches_pure_python_mirror(spark):
    rows = [
        (i, [((i * 7 + d * 13) % 29 - 14) / 17.0 for d in range(6)],
         i % 3)
        for i in range(40)
    ]
    got = [
        (r["cid"], r["n_vecs"], r["c_l1"], r["wcss"])
        for r in kmeans_clusters(_edf(spark, rows), n_iters=2).collect()
    ]
    assert got == _mirror(rows)


def test_tie_breaks_on_lower_cid(spark):
    # two identical seed centroids (labels 0 and 1 share the vector
    # value): every vector is equidistant, so all go to cid 0.
    rows = [
        (0, [0.25, 0.25], 0),
        (1, [0.25, 0.25], 1),
        (2, [0.10, -0.30], 0),
    ]
    quant = quantize(_edf(spark, rows, parts=2))
    cents = seed_centroids(quant)
    assert [c for c, _ in cents] == [0, 1]
    assert cents[0][1] == cents[1][1]
    got = {
        r["vec_id"]: r["cid"]
        for r in assign(quant, cents).select("vec_id", "cid").collect()
    }
    assert set(got.values()) == {0}


def test_update_is_exact_floor_mean_incl_negative(spark):
    # sums -3 over 2 members: floor(-1.5) = -2 (truncation would say
    # -1) — pins that the M-step floors, matching the Python mirror.
    rows = [
        (0, [-1e-6, 3e-6], 0),
        (1, [-2e-6, 4e-6], 0),
    ]
    quant = quantize(_edf(spark, rows, parts=2))
    assigned = assign(quant, seed_centroids(quant))
    cents = update(assigned)
    assert cents == [(0, [-2, 3])]


def test_empty_cluster_drops_out(spark):
    # labels 0 and 1 seed on IDENTICAL vectors: the (dist, cid)
    # tie-break sends every vector to cid 0, cluster 1 gets zero
    # members in the first E-step and vanishes from the model — the
    # final report holds only the surviving cluster.
    rows = [
        (0, [0.2, 0.2], 0),
        (1, [0.2, 0.2], 1),
        (2, [0.21, 0.19], 0),
    ]
    out = kmeans_clusters(_edf(spark, rows), n_iters=2).collect()
    got = [(r["cid"], r["n_vecs"], r["c_l1"], r["wcss"]) for r in out]
    assert [cid for cid, *_ in got] == [0]
    assert got == _mirror(rows)


def test_deterministic_across_partitionings(spark):
    rows = [
        (i, [((i * 11 + d * 5) % 37 - 18) / 41.0 for d in range(8)],
         i % 4)
        for i in range(60)
    ]
    a = kmeans_clusters(_edf(spark, rows, parts=1), n_iters=2).collect()
    b = kmeans_clusters(_edf(spark, rows, parts=7), n_iters=2).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_quantize_is_floor_of_double_product(spark):
    rows = [(0, [0.1, -0.1, 0.0], 0)]
    df = _edf(spark, rows, parts=1)
    q = quantize(df).collect()[0]["q"]
    # the double promotion of float32 0.1 is ~0.10000000149, so
    # floor(·1e6) = 100000; for -0.1 it is -100001 (floor, not
    # truncate) — the asymmetry only floor gives, and the reason
    # there are no round-half ties for the engines to disagree on.
    f32 = [r["embedding"] for r in df.select("embedding").collect()][0]
    assert q == [math.floor(float(v) * SCALE) for v in f32]
    assert q == [100000, -100001, 0]
