"""Host-graph structure mining: LPA communities + triangles (X135–X136).

The link-rank family (operators/linkrank.py: PageRank X48, HITS,
TrustRank, OPIC, graph health panel) ranks hosts; this module finds
STRUCTURE in the same (src_host, dst_host) edge relation — the two
classic primitives a web-graph pipeline runs for mirror-farm /
link-spam / topical-cluster analysis:

* `host_communities` — synchronous label propagation (Raghavan,
  Albert & Kumara 2007; the near-linear community detector GraphX
  ships as `LabelPropagation`). Each host starts as its own label;
  each round every host adopts the most frequent label among its
  neighbours. Spam farms and mirror constellations collapse into one
  label within a few rounds.
* `host_triangles` — exact per-host triangle counts and local
  clustering coefficients via the degree-ordered orientation
  algorithm (Suri & Vassilvitskii, WWW 2011; Cohen's MapReduce
  formulation). Link farms show as high-clustering hosts; bridges
  and organic hubs show low.

Determinism (the linkrank discipline): LPA is made deterministic by
a TOTAL tie-break — adopt the neighbour label with (count DESC,
label ASC) — and a FIXED synchronous round count (no convergence
probe; sync LPA can oscillate on bipartite structures, a fixed
round count is deterministic regardless). Triangle counts are exact
integers; clustering coefficient is published as BIGINT ppm
(2·tri·10^6 DIV deg·(deg−1)). No float anywhere; both DuckDB
oracles replay bit-exactly.

Scale shape (the 100 TB contract): the host graph is orders of
magnitude smaller than the page corpus (FineWeb: ~10^8 pages from
~10^7 hosts; edges ≈ registrable-domain pairs), but still far too
big to collect. LPA rounds are each ONE equi-join of the |V|-row
label relation onto the adjacency (partitioned by dst) + ONE
(host, label) groupBy + ONE per-host argmax — the same
join-groupBy-per-iteration shape as host_rank, broadcast-eligible
when |V| fits. Triangles: orienting every edge toward the higher
(degree, id) endpoint bounds every out-degree by O(sqrt(2|E|)), so
the wedge self-join — the only superlinear step — is
sum(outdeg²) = O(|E|^1.5) worst-case instead of sum(deg²) which a
star host would quadratic-blow. No windows over unbounded
partitions; the per-host argmax window is bounded by neighbour
count.

Reference tie-in: the Go crawler sees one host (ptt.cc,
config.go:10); host-graph analytics are pipeline-extension
territory (SURVEY §2 X-table; edges come from X63's real outlink
extraction or the deterministic host_edges_from_documents twin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: fixed synchronous LPA rounds (deterministic; no convergence probe).
LPA_ROUNDS = 3


def _sym(edges: DataFrame) -> DataFrame:
    """Undirected simple adjacency: both directions of every distinct
    pair, self-loops dropped. One row per (host, neighbour)."""
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    return (
        e.union(e.select(F.col("dst").alias("src"),
                         F.col("src").alias("dst")))
        .distinct()
    )


def host_communities(edges: DataFrame,
                     rounds: int = LPA_ROUNDS) -> DataFrame:
    """(host, community, n_members): synchronous label propagation
    after `rounds` rounds — community = the surviving label (a host
    name), n_members = its final size. Ties adopt the smallest label
    (total order). Nodes are edge endpoints. Ordered by host."""
    sym = _sym(edges).localCheckpoint()  # feeds every round + nodes
    nodes = sym.select(F.col("src").alias("host")).distinct()
    lbl = nodes.select("host", F.col("host").alias("lbl"))
    for _ in range(rounds):
        nb = (
            sym.join(
                lbl.withColumnsRenamed({"host": "dst", "lbl": "nlbl"}),
                "dst",
            )
            .groupBy(F.col("src").alias("host"), F.col("nlbl").alias("lbl"))
            .agg(F.count("*").alias("c"))
        )
        # argmax with (count DESC, label ASC): min of (-c, lbl).
        lbl = (
            nb.groupBy("host")
            .agg(
                F.min(
                    F.struct((-F.col("c")).alias("negc"),
                             F.col("lbl").alias("lbl"))
                ).alias("m")
            )
            .select("host", F.col("m.lbl").alias("lbl"))
            # materialize each round: truncates the join-chain lineage
            # (the connected-components / X53 per-round discipline).
            .localCheckpoint()
        )
    sizes = lbl.groupBy("lbl").agg(F.count("*").cast("long").alias("n"))
    return (
        lbl.join(sizes, "lbl")
        .select(
            "host", F.col("lbl").alias("community"),
            F.col("n").alias("n_members"),
        )
        .orderBy("host")
    )


def host_triangles(edges: DataFrame) -> DataFrame:
    """(host, degree, n_triangles, clustering_ppm): exact triangle
    count per host over the undirected simple graph, plus the local
    clustering coefficient 2·tri·10^6 DIV deg·(deg−1) (0 when
    deg < 2). Degree-ordered orientation: each edge points to the
    higher (degree, host) endpoint, so every triangle is one wedge
    at its lowest vertex closed by one oriented edge, counted
    exactly once. Ordered by host."""
    sym = _sym(edges).localCheckpoint()  # feeds degrees + orientation
    deg = sym.groupBy(F.col("src").alias("host")).agg(
        F.count("*").cast("long").alias("degree")
    )
    # canonical undirected pairs (one row per edge) with both degrees
    canon = (
        sym.filter(F.col("src") < F.col("dst"))
        .join(deg.withColumnsRenamed({"host": "src", "degree": "dsrc"}),
              "src")
        .join(deg.withColumnsRenamed({"host": "dst", "degree": "ddst"}),
              "dst")
    )
    # orient toward the higher (degree, host)
    o = canon.select(
        F.when(
            (F.col("dsrc") < F.col("ddst"))
            | ((F.col("dsrc") == F.col("ddst"))
               & (F.col("src") < F.col("dst"))),
            F.struct(F.col("src").alias("u"), F.col("dst").alias("v")),
        ).otherwise(
            F.struct(F.col("dst").alias("u"), F.col("src").alias("v"))
        ).alias("e")
    ).select(F.col("e.u").alias("u"), F.col("e.v").alias("v"))
    o = o.localCheckpoint()  # feeds both wedge sides + the closer
    # wedges at u: unordered out-neighbour pairs, closed by o(v, w)
    w1 = o.select("u", F.col("v").alias("a"))
    w2 = o.select("u", F.col("v").alias("b"))
    wedges = w1.join(w2, "u").filter(F.col("a") != F.col("b"))
    tri = wedges.join(
        o.withColumnsRenamed({"u": "a", "v": "b"}), ["a", "b"]
    )
    per_host = (
        tri.select(F.explode(F.array("u", "a", "b")).alias("host"))
        .groupBy("host")
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )
    return (
        deg.join(per_host, "host", "left")
        .select(
            "host", "degree",
            F.coalesce("n_triangles", F.lit(0)).cast("long")
            .alias("n_triangles"),
            F.when(
                F.col("degree") >= 2,
                F.expr(
                    "coalesce(n_triangles, 0) * 2000000"
                    " DIV (degree * (degree - 1))"
                ),
            ).otherwise(F.lit(0)).cast("long").alias("clustering_ppm"),
        )
        .orderBy("host")
    )
