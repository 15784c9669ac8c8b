"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k against a query vector. The dot
  product is a JVM-side fold (zip_with + aggregate over doubles, no
  Python), evaluated in one scan + one top-k sort — the correct baseline
  shape; at 100 TB it parallelizes perfectly (narrow, no shuffle until
  the final k-row reduction).
- random_hyperplane_buckets: sign-bit LSH bucketing. Hyperplanes here
  are existing vectors (deterministic, oracle-expressible); bucketed
  ANN = brute force within the query's bucket only.
- ivf_topk: IVF-style two-stage search — coarse centroids (one vector
  per label here, standing in for k-means centroids), probe the nearest
  n_probe cells, exact search inside them. The scale path: touches
  |cells_probed| / |cells| of the data.

Scale shape of the selection steps: the query row and the hyperplanes
are picked with orderBy().limit(n) — planned as TakeOrderedAndProject
(per-partition top-n, then a tiny merge), NOT a global Window over the
whole table, which would funnel every row through one task at 100 TB.
The query row carries its own id, so no separate driver job computes
qid. Plane numbering happens via collect_list+posexplode over the
already-limited n rows (no partition-less window anywhere).

All folds are sequential left-folds over index order, so DuckDB's
list_reduce produces bit-identical doubles for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-order double-precision dot product (oracle-exact)."""
    prods = F.zip_with(
        a.cast("array<double>"), b.cast("array<double>"), lambda x, y: x * y
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def query_row(embeddings: DataFrame, vec_id: int | None = None) -> DataFrame:
    """One-row (qid, qvec) DataFrame: the embedding of `vec_id`
    (default: the smallest vec_id — deterministic and
    oracle-expressible). orderBy().limit(1) -> TakeOrdered, so no
    global single-partition sort; qid rides along so callers never
    need a second job to learn the query id."""
    q = (
        embeddings
        if vec_id is None
        else embeddings.filter(F.col("vec_id") == vec_id)
    )
    return q.orderBy("vec_id").limit(1).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )


def brute_force_topk(embeddings: DataFrame, k: int = 10,
                     query_id: int | None = None) -> DataFrame:
    """(vec_id, score) exact cosine top-k vs the query vector; the query
    row itself is excluded. Deterministic tie-break by vec_id."""
    # qnorm rides on the 1-row broadcast: norm(qvec) would otherwise be
    # re-folded once per scanned row (identical doubles either way).
    q = query_row(embeddings, query_id).withColumn("qnorm", norm(F.col("qvec")))
    scored = embeddings.crossJoin(F.broadcast(q)).select(
        "vec_id", "qid",
        F.round(
            dot(F.col("embedding"), F.col("qvec"))
            / (norm(F.col("embedding")) * F.col("qnorm")),
            6,
        ).alias("score"),
    )
    return (
        scored.filter(F.col("vec_id") != F.col("qid"))
        .select("vec_id", "score")
        .orderBy(F.col("score").desc(), F.col("vec_id").asc())
        .limit(k)
    )


def _plane_vectors(embeddings: DataFrame, n_planes: int) -> list[list[float]]:
    """The n_planes hyperplanes, vec_id-ascending. A TakeOrdered driver
    probe of n_planes rows (same class as the engine's max-page / Bloom
    probes) — at 100 TB this stays n_planes rows regardless of table
    size."""
    rows = (
        embeddings.orderBy("vec_id").limit(n_planes)
        .select("vec_id", "embedding").collect()
    )
    return [list(map(float, r["embedding"])) for r in rows]


def bucket_expr(planes: list[list[float]]) -> Column:
    """Sign-bit bucket of `embedding` vs literal hyperplanes — a pure
    per-row projection: no crossJoin row blowup, no groupBy shuffle.
    (The previous shape — explode against a broadcast planes table +
    groupBy(vec_id) — shuffled the entire embeddings table once per
    bucketing; this is narrow and codegen'd.)"""
    b = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        arr = F.array(*[F.lit(x) for x in plane])
        b = b + F.when(
            dot(F.col("embedding"), arr) > 0, F.lit(1 << i).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return b


def random_hyperplane_buckets(embeddings: DataFrame, n_planes: int = 4) -> DataFrame:
    """(vec_id, bucket): bucket = sign bits of dot(v, plane_i).

    Planes are the embeddings of the n_planes smallest vec_ids —
    deterministic stand-ins for seeded random hyperplanes, chosen so the
    DuckDB oracle can reproduce them with a subquery. The planes ride
    into the plan as literals (driver probe of n_planes rows), making
    bucketing a narrow per-row projection — one scan, zero shuffles."""
    return embeddings.select(
        "vec_id", bucket_expr(_plane_vectors(embeddings, n_planes)).alias("bucket")
    )


def near_dup_pairs(
    embeddings: DataFrame, threshold: float = 0.3, bucket_col: str = "label"
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (a, b) with
    cosine >= threshold, candidate-limited to a shared bucket.

    The bucket join is the scale path: a self-join on the bucket key
    shuffles each side once on that key and compares only within-bucket
    pairs — O(sum(|bucket|^2)) instead of O(n^2). At 100 TB the bucket
    would be an LSH band (random_hyperplane_buckets) instead of the
    label column; the join shape is identical. Deterministic output:
    pair ordered by vec_id, score rounded to 6 (oracle parity).
    """
    # Norms are per-VECTOR, so compute them in the projection before
    # the join — cosine() inside the pair select would re-run the
    # aggregate-fold norm twice per PAIR (measured ~3x the HOF work;
    # numerically identical: same sqrt(dot(v,v)) double, same order).
    a = embeddings.select(
        F.col(bucket_col).alias("bucket"),
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        norm(F.col("embedding")).alias("norm_a"),
    )
    b = embeddings.select(
        F.col(bucket_col).alias("bucket"),
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        norm(F.col("embedding")).alias("norm_b"),
    )
    pairs = a.join(b, on="bucket").filter(F.col("vec_a") < F.col("vec_b"))
    scored = pairs.select(
        "vec_a", "vec_b",
        F.round(
            dot(F.col("emb_a"), F.col("emb_b"))
            / (F.col("norm_a") * F.col("norm_b")),
            6,
        ).alias("score"),
    )
    return scored.filter(F.col("score") >= threshold)


def lsh_bucket_topk(embeddings: DataFrame, k: int = 10,
                    n_planes: int = 4) -> DataFrame:
    """Bucketed ANN: exact cosine top-k restricted to the query's
    sign-bit LSH bucket. The scale path touches only |bucket|/|table|
    of the data (vs brute force); recall is what the bucketing trades
    away. Query = lowest-vec_id embedding, excluded from results.

    Plan shape: bucket is a per-row literal-planes projection on the
    scan (no bucket join), the query row is a 1-row TakeOrdered
    broadcast — the whole search is one scan + one top-k, no shuffle."""
    planes = _plane_vectors(embeddings, n_planes)
    e = embeddings.withColumn("bucket", bucket_expr(planes))
    q = (
        e.orderBy("vec_id").limit(1)
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"),
                F.col("bucket").alias("qbucket"),
                norm(F.col("embedding")).alias("qnorm"))
    )
    in_bucket = e.join(
        F.broadcast(q), e["bucket"] == F.col("qbucket")
    ).filter(F.col("vec_id") != F.col("qid"))
    return (
        in_bucket.select(
            "vec_id",
            F.round(
                dot(F.col("embedding"), F.col("qvec"))
                / (norm(F.col("embedding")) * F.col("qnorm")),
                6,
            ).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("vec_id").asc())
        .limit(k)
    )


def ivf_topk(embeddings: DataFrame, k: int = 10, n_probe: int = 2,
             label_col: str = "label", query_id: int | None = None) -> DataFrame:
    """IVF-style ANN: centroid per label cell = the cell's lowest-id
    vector (deterministic coarse quantizer); probe the n_probe cells
    whose centroid is closest to the query; exact cosine inside them.
    The per-cell window is partitioned by cell — no global exchange."""
    w = Window.partitionBy(label_col).orderBy("vec_id")
    centroids = (
        embeddings.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select(F.col(label_col).alias("cell"), F.col("embedding").alias("cvec"))
    )
    q = query_row(embeddings, query_id)
    probe_cells = (
        centroids.crossJoin(F.broadcast(q))
        .select("cell", F.round(cosine(F.col("cvec"), F.col("qvec")), 6).alias("cs"))
        .orderBy(F.col("cs").desc(), F.col("cell").asc())
        .limit(n_probe)
        .select("cell")
    )
    in_cells = embeddings.join(
        F.broadcast(probe_cells), embeddings[label_col] == probe_cells["cell"]
    )
    return (
        in_cells.crossJoin(F.broadcast(q.withColumn("qnorm", norm(F.col("qvec")))))
        .select(
            "vec_id", "qid",
            F.round(
                dot(F.col("embedding"), F.col("qvec"))
                / (norm(F.col("embedding")) * F.col("qnorm")),
                6,
            ).alias("score"),
        )
        .filter(F.col("vec_id") != F.col("qid"))
        .select("vec_id", "score")
        .orderBy(F.col("score").desc(), F.col("vec_id").asc())
        .limit(k)
    )


def semantic_dedup(embeddings: DataFrame, threshold: float = 0.3) -> DataFrame:
    """(vec_id, cluster_id, is_keeper): SemDeDup-style SEMANTIC
    deduplication (Abbas et al. 2023) — the embedding-space twin of
    the MinHash duplicate_clusters pipeline: cosine near-dup pairs
    (bucket-limited self-join, near_dup_pairs) become an undirected
    graph, connected components (large-star/small-star, O(log d)
    rounds) assign every vector to its semantic cluster, and the
    keeper is the cluster's minimum vec_id. Dropping non-keepers is
    exactly the SemDeDup pruning rule with a min-id representative
    (the paper keeps the lowest-similarity-to-centroid item; a
    deterministic representative keeps the oracle exact and the
    operator shape identical).

    Scale shape: inherits its stages' audited plans — the pair join
    is bucket-limited (no all-pairs), the component loop is two
    shuffles per O(log d) round with per-round localCheckpoint.
    """
    from ptt_spider_go_spark.pipeline.clusters import duplicate_clusters

    pairs = near_dup_pairs(embeddings, threshold=threshold).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b"))
    comp = duplicate_clusters(
        embeddings.select(F.col("vec_id").alias("doc_id")), pairs)
    return comp.select(
        F.col("doc_id").alias("vec_id"), "cluster_id", "is_keeper")


def semantic_decontaminate(train: DataFrame, eval_set: DataFrame,
                           threshold: float = 0.3) -> DataFrame:
    """(vec_id, max_eval_cos, contaminated): embedding-space train/eval
    decontamination — the SEMANTIC complement of the 13-gram lexical
    check (dedup_text.decontaminate, X26): a training document whose
    embedding sits within `threshold` cosine of ANY eval-set embedding
    is flagged (paraphrased eval leakage that shares no 13-gram).
    Every train row gets a verdict row; max_eval_cos is NULL (and
    contaminated False) when the eval set is empty — absence of
    evidence, not a zero score.

    Scale shape: an eval suite is thousands of rows against billions
    of train rows, so the eval side broadcasts and the scan stays on
    the train side — one BroadcastNestedLoopJoin (the deliberate
    tiny-side cross the ANN family uses, allow-listed in the plan
    audit), a groupBy(vec_id) max with map-side partials, and an
    equi-join back (train-sized on both sides — NOT broadcast) for the
    empty-eval total verdict. Scores round to 6 dp BEFORE the
    max/threshold (near_dup_pairs' float stabilization, keeping the
    DuckDB oracle bit-exact)."""
    # Norms hoisted into the per-side projections (the near_dup_pairs
    # move): cosine() inside the pair select would re-run the
    # aggregate-fold norm per PAIR; numerically identical doubles.
    ev = eval_set.select(
        F.col("embedding").alias("_evec"),
        norm(F.col("embedding")).alias("_en"),
    )
    scored = (
        train.select("vec_id", "embedding",
                     norm(F.col("embedding")).alias("_tn"))
        .crossJoin(F.broadcast(ev))
        .select(
            "vec_id",
            F.round(
                dot(F.col("embedding"), F.col("_evec"))
                / (F.col("_tn") * F.col("_en")),
                6,
            ).alias("_c"),
        )
        .groupBy("vec_id")
        .agg(F.max("_c").alias("max_eval_cos"))
    )
    return (
        train.select("vec_id")
        .join(scored, "vec_id", "left")
        .select(
            "vec_id", "max_eval_cos",
            F.coalesce(F.col("max_eval_cos") >= threshold, F.lit(False))
            .alias("contaminated"),
        )
    )
