"""Duplicate-cluster assignment: connected components over the
near-dup pair graph.

Pair lists (MinHash-LSH bands, embedding near-dups, Jaccard pairs) are
only half of deduplication — a 100 TB pipeline must then assign every
document to a duplicate CLUSTER and keep one representative per
cluster. That is connected components over the pair graph.

Implementation: the alternating **large-star / small-star** algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14 — the standard two-round-primitive CC for shuffle-based
engines), replacing r3's plain min-label propagation (VERDICT r03
next-round #4). Why: propagation moves the min label ONE hop per
superstep — O(component diameter) rounds, which on a pathological
duplicate chain is O(n) and silently wrong past max_iters. The star
operations rewire whole neighborhoods at the neighborhood minimum each
round, converging in O(log diameter) rounds deterministically:

- large-star(u): every neighbor v > u re-attaches to
  m = min(N(u) ∪ {u})
- small-star(u): over the child-edges (v ≤ u), every v and u itself
  re-attach to m = min(N≤(u) ∪ {u})

Each operation is one groupBy(min) + one equi-join — two shuffles per
round, lineage truncated per round with localCheckpoint like the crawl
frontier loop; the fixpoint probe is one scalar row (count + order-
insensitive checksum), never a table collect. On convergence the edge
set IS the star (child -> component-min root).

The cluster id is the component's minimum doc_id — deterministic and
oracle-expressible (DuckDB WITH RECURSIVE reachability + min); string
ids compare lexicographically in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ptt_spider_go_spark.pipeline.common import md5_long, tokens


def _large_star(edges: DataFrame) -> DataFrame:
    """(u,v) edge set -> re-attach every strictly-larger neighbor to the
    neighborhood minimum. Input need not be symmetric; symmetrization
    happens here (the union is the same shuffle the groupBy needs)."""
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = sym.groupBy("u").agg(F.min("v").alias("_mn"))
    m = F.least(F.col("_mn"), F.col("u"))
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), m.alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient every edge parent-ward (larger -> smaller), then re-attach
    each node's smaller neighbors AND the node itself to the minimum of
    that child neighborhood."""
    e = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).where(F.col("u") != F.col("v"))
    mins = e.groupBy("u").agg(F.min("v").alias("_mn"))
    rewired = (
        e.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("_mn").alias("v"))
        .unionByName(mins.select("u", F.col("_mn").alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    return rewired


def _edge_sig(edges: DataFrame) -> tuple[int, int]:
    """(count, order-insensitive checksum) — the one-row fixpoint probe."""
    # bit_xor: order-insensitive and overflow-free under ANSI mode
    # (edge sets are distinct, so xor-cancellation of duplicates can't
    # mask a change that count doesn't already catch)
    row = edges.select(
        F.xxhash64(F.col("u").cast("string"),
                   F.col("v").cast("string")).alias("h")
    ).agg(
        F.count("*").alias("n"),
        F.coalesce(F.expr("bit_xor(h)"), F.lit(0)).alias("sig"),
    ).collect()[0]
    return int(row["n"]), int(row["sig"])


def connected_components(nodes: DataFrame, edges: DataFrame,
                         max_iters: int = 50,
                         stats: dict | None = None) -> DataFrame:
    """(doc_id, cluster_id) for every node; cluster_id = min doc_id of
    the node's component (isolated nodes form singleton clusters).

    nodes: one `doc_id` column; edges: (doc_a, doc_b) undirected.
    `stats`, when passed, receives {'iterations': rounds-to-fixpoint}
    (the chain-fixture test pins the O(log d) round count).
    """
    e = edges.select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    ).where(F.col("u") != F.col("v")).distinct().localCheckpoint(eager=True)

    sig = _edge_sig(e)
    rounds = 0
    for _ in range(max_iters):
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        rounds += 1
        new_sig = _edge_sig(e)
        if new_sig == sig:
            break
        sig = new_sig
    if stats is not None:
        stats["iterations"] = rounds

    # fixpoint edge set is the star: (child, component-min root)
    labels = (
        nodes.select("doc_id")
        .join(e.select(F.col("u").alias("doc_id"),
                       F.col("v").alias("_root")),
              "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("_root"), F.col("doc_id")).alias("cluster_id"),
        )
    )
    return labels


def duplicate_clusters(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """(doc_id, cluster_id, is_keeper): every document assigned to its
    near-dup component; the keeper is the cluster's minimum doc_id (the
    same canonical-representative rule as exact_dup_groups)."""
    comp = connected_components(docs.select("doc_id"), pairs)
    return comp.select(
        "doc_id", "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_keeper"),
    )


def quality_keepers(docs: DataFrame, pairs: DataFrame,
                    quality: DataFrame) -> DataFrame:
    """(doc_id, cluster_id, quality, keep): duplicate-cluster
    representative selection by QUALITY — production pipelines keep
    the best document of each near-dup cluster, not the smallest id
    (the X15/X1 canonical-min rule is an id policy; this is the
    curation policy: highest quality score wins, ties to the lower
    doc_id so the choice stays total and oracle-exact).

    Scale shape: components come from the same O(log d)
    connected_components; the keeper per cluster is ONE
    groupBy(cluster_id) of a lexicographic struct max
    ((quality, -doc_id) — map-side partial max, no window over
    cluster members, so a pathological million-document cluster
    reduces instead of sorting), then an equi-join back on
    cluster_id."""
    comp = connected_components(docs.select("doc_id"), pairs)
    scored = comp.join(quality.select("doc_id", "quality"), "doc_id")
    keeper = scored.groupBy("cluster_id").agg(
        F.max(F.struct(F.col("quality").alias("q"),
                       (-F.col("doc_id")).alias("negid"))).alias("m")
    ).select("cluster_id", (-F.col("m.negid")).alias("_keeper"))
    return (
        scored.join(keeper, "cluster_id")
        .select("doc_id", "cluster_id", "quality",
                (F.col("doc_id") == F.col("_keeper")).alias("keep"))
    )


#: split percentage bounds (of 100): [0, TRAIN) train,
#: [TRAIN, TRAIN+VAL) val, rest test.
SPLIT_TRAIN_PCT = 90
SPLIT_VAL_PCT = 5
#: hash seed separating the split draw from every other md5 use.
SPLIT_SEED = 71


def leakage_safe_splits(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """(doc_id, cluster_id, split): deterministic train/val/test
    assignment that can NEVER leak near-duplicates across splits —
    the draw hashes the CLUSTER id, not the doc id, so every member
    of a near-dup component lands in the same split by construction
    (the eval-hygiene split real corpora need: a verbatim or near
    copy of a validation document sitting in train is exactly the
    contamination X26/X127 measure after the fact; splitting by
    cluster prevents it up front).

    split = md5(seed:cluster_id) % 100 -> [0,90) train, [90,95) val,
    [95,100) test. The draw is the repo-wide 60-bit md5 construction:
    deterministic, seedable, bit-identical in the DuckDB oracle, and
    independent of corpus order or partitioning. Cluster ids come
    from the same O(log d) connected components as X15; singleton
    docs are their own cluster, so unique docs split i.i.d. while
    dup constellations move as one unit (weighted by cluster mass,
    which is the statistically honest way to split a deduplicatable
    corpus).

    Scale shape: components + ONE map-only hash projection — no new
    shuffles beyond connected_components itself."""
    comp = connected_components(docs.select("doc_id"), pairs)
    bucket = F.pmod(
        md5_long(F.col("cluster_id").cast("string"), seed=SPLIT_SEED),
        F.lit(100),
    )
    return comp.select(
        "doc_id", "cluster_id",
        F.when(bucket < SPLIT_TRAIN_PCT, F.lit("train"))
        .when(bucket < SPLIT_TRAIN_PCT + SPLIT_VAL_PCT, F.lit("val"))
        .otherwise(F.lit("test")).alias("split"),
    )


def split_manifest(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """(split, n_docs, n_clusters, n_tokens): the release manifest
    for the leakage-safe split — document, cluster, and whitespace-
    token mass per split, one tiny groupBy over the per-doc
    assignment. Ordered by split."""
    assigned = leakage_safe_splits(docs, pairs)
    toks = docs.select(
        "doc_id", F.size(tokens(F.col("text"))).cast("long").alias("nt")
    )
    return (
        assigned.join(toks, "doc_id")
        .groupBy("split")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.countDistinct("cluster_id").cast("long").alias("n_clusters"),
            F.sum("nt").cast("long").alias("n_tokens"),
        )
        .orderBy("split")
    )
