"""Duplicate-cluster assignment: connected components over the
near-dup pair graph.

Pair lists (MinHash-LSH bands, embedding near-dups, Jaccard pairs) are
only half of deduplication — a 100 TB pipeline must then assign every
document to a duplicate CLUSTER and keep one representative per
cluster. That is connected components over the pair graph.

Implementation: iterative min-label propagation expressed in DataFrame
ops — label(v) starts as doc_id; each superstep takes the min of a
node's label and its neighbors' labels; convergence in O(component
diameter) supersteps (near-dup clusters are shallow in practice; a
max_iters guard bounds pathological chains). Each superstep is one
shuffle on dst + one groupBy on doc_id; lineage is truncated per
superstep with localCheckpoint exactly like the crawl frontier loop
(plans/crawl.py), and the fixpoint test is a scalar count probe.

The cluster id is the component's minimum doc_id — deterministic and
oracle-expressible (DuckDB WITH RECURSIVE reachability + min).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(nodes: DataFrame, edges: DataFrame,
                         max_iters: int = 25) -> DataFrame:
    """(doc_id, cluster_id) for every node; cluster_id = min doc_id of
    the node's component (isolated nodes form singleton clusters).

    nodes: one `doc_id` column; edges: (doc_a, doc_b) undirected.
    """
    sym = edges.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        edges.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    labels = nodes.select("doc_id", F.col("doc_id").alias("cluster_id"))
    labels = labels.localCheckpoint(eager=True)

    for _ in range(max_iters):
        nbr = (
            sym.join(labels, sym["dst"] == labels["doc_id"])
            .select(F.col("src").alias("doc_id"), "cluster_id")
        )
        new_labels = (
            labels.unionByName(nbr)
            .groupBy("doc_id")
            .agg(F.min("cluster_id").alias("cluster_id"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
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
