"""X135/X136: LPA communities + triangle counting (operators/graphalgo.py).

Pins: pure-Python mirrors of synchronous LPA (same symmetrization,
same (count DESC, label ASC) tie-break, same fixed rounds) and of
brute-force triangle enumeration match Spark exactly on hand and
md5-derived fixtures; two cliques joined by one bridge resolve into
two communities; K4 / triangle / square / star shapes produce the
textbook counts and clustering coefficients; duplicate and reversed
edge rows don't change anything (simple-graph semantics); and both
operators are partitioning-invariant.
"""

from __future__ import annotations

import hashlib
import itertools

from ptt_spider_go_spark.operators.graphalgo import (
    LPA_ROUNDS,
    host_communities,
    host_triangles,
)

SCHEMA = "src string, dst string"


def _edges(spark, pairs, parts=4):
    return spark.createDataFrame(
        [(a, b) for a, b in pairs], schema=SCHEMA
    ).repartition(parts)


def _sym(pairs):
    s = set()
    for a, b in pairs:
        if a != b:
            s.add((a, b))
            s.add((b, a))
    return s


def _mirror_lpa(pairs, rounds=LPA_ROUNDS):
    sym = _sym(pairs)
    adj: dict[str, list[str]] = {}
    for a, b in sym:
        adj.setdefault(a, []).append(b)
    lbl = {n: n for n in adj}
    for _ in range(rounds):
        new = {}
        for n, nbs in adj.items():
            cnt: dict[str, int] = {}
            for m in nbs:
                cnt[lbl[m]] = cnt.get(lbl[m], 0) + 1
            new[n] = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        lbl = new
    sizes: dict[str, int] = {}
    for v in lbl.values():
        sizes[v] = sizes.get(v, 0) + 1
    return sorted((n, lbl[n], sizes[lbl[n]]) for n in adj)


def _mirror_tri(pairs):
    sym = _sym(pairs)
    adj: dict[str, set[str]] = {}
    for a, b in sym:
        adj.setdefault(a, set()).add(b)
    tri = {n: 0 for n in adj}
    for x, y, z in itertools.combinations(sorted(adj), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            tri[x] += 1
            tri[y] += 1
            tri[z] += 1
    out = []
    for n in sorted(adj):
        d = len(adj[n])
        ppm = tri[n] * 2_000_000 // (d * (d - 1)) if d >= 2 else 0
        out.append((n, d, tri[n], ppm))
    return out


def _clique(prefix, n):
    nodes = [f"{prefix}{i}" for i in range(n)]
    return list(itertools.combinations(nodes, 2))


def _rand_graph(n=24, m=60):
    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    pairs = []
    for i in range(m):
        a, b = h(f"a{i}") % n, h(f"b{i}") % n
        if a != b:
            pairs.append((f"n{a:02d}", f"n{b:02d}"))
    return pairs


def test_lpa_matches_mirror_on_random_graph(spark):
    pairs = _rand_graph()
    got = [
        (r["host"], r["community"], r["n_members"])
        for r in host_communities(_edges(spark, pairs)).collect()
    ]
    assert got == _mirror_lpa(pairs)


def test_lpa_two_cliques_one_bridge(spark):
    pairs = _clique("a", 5) + _clique("b", 5) + [("a0", "b0")]
    got = {
        r["host"]: r["community"]
        for r in host_communities(_edges(spark, pairs)).collect()
    }
    assert got == dict((n, c) for n, c, _s in _mirror_lpa(pairs))
    a_comms = {got[f"a{i}"] for i in range(5)}
    b_comms = {got[f"b{i}"] for i in range(5)}
    assert len(a_comms) == 1 and len(b_comms) == 1
    assert a_comms != b_comms


def test_triangles_textbook_shapes(spark):
    pairs = (
        _clique("k", 4)                                  # K4: 4 triangles
        + [("t0", "t1"), ("t1", "t2"), ("t2", "t0")]     # triangle
        + [("s0", "s1"), ("s1", "s2"), ("s2", "s3"), ("s3", "s0")]  # C4
        + [("c", f"leaf{i}") for i in range(5)]           # star
    )
    got = [
        (r["host"], r["degree"], r["n_triangles"], r["clustering_ppm"])
        for r in host_triangles(_edges(spark, pairs)).collect()
    ]
    assert got == _mirror_tri(pairs)
    by = {h: (d, t, p) for h, d, t, p in got}
    assert by["k0"] == (3, 3, 1_000_000)       # K4 node: all wedges closed
    assert by["t0"] == (2, 1, 1_000_000)
    assert by["s0"] == (2, 0, 0)
    assert by["c"] == (5, 0, 0)
    assert by["leaf0"] == (1, 0, 0)


def test_triangles_match_mirror_on_random_graph(spark):
    pairs = _rand_graph(n=16, m=80)
    got = [
        (r["host"], r["degree"], r["n_triangles"], r["clustering_ppm"])
        for r in host_triangles(_edges(spark, pairs)).collect()
    ]
    assert got == _mirror_tri(pairs)


def test_duplicate_and_reversed_edges_are_simple(spark):
    base = _clique("k", 4)
    noisy = base + [(b, a) for a, b in base] + base + [("k0", "k0")]
    a = [tuple(r) for r in host_triangles(_edges(spark, base)).collect()]
    b = [tuple(r) for r in host_triangles(_edges(spark, noisy)).collect()]
    assert a == b
    ca = [tuple(r) for r in host_communities(_edges(spark, base)).collect()]
    cb = [tuple(r) for r in host_communities(_edges(spark, noisy)).collect()]
    assert ca == cb


def test_partitioning_invariance(spark):
    pairs = _rand_graph(n=20, m=70)
    a = [tuple(r)
         for r in host_communities(_edges(spark, pairs, 2)).collect()]
    b = [tuple(r)
         for r in host_communities(_edges(spark, pairs, 7)).collect()]
    assert a == b
    ta = [tuple(r) for r in host_triangles(_edges(spark, pairs, 2)).collect()]
    tb = [tuple(r) for r in host_triangles(_edges(spark, pairs, 7)).collect()]
    assert ta == tb
