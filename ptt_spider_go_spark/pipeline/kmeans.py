"""Exact-integer Lloyd k-means over the embeddings table (X121).

Semantic clustering of a 100 TB corpus' embedding space — topic
discovery, cluster-balanced sampling (SemDeDup / density-aware
mixtures), per-cluster quality triage — is k-means at heart, and
Lloyd's iteration distributes perfectly: each round is ONE full-scan
map (assign every vector to its nearest centroid; the k×d centroid
model rides along as literals/broadcast, so there is no join and no
shuffle on the corpus side) plus ONE (cid, dim) groupBy whose output
is k·d rows (map-side partial aggregation; orders of magnitude
smaller than the corpus). The k·d model collects to the driver
between rounds — the approved scalar/model-probe idiom (the same
shape as bpe.phrase_merges' one-row argmax probe).

Float k-means is not oracle-able: FP sums are order-dependent, so a
Spark partial-agg tree and a single-threaded oracle drift. This
implementation is therefore integer-exact end to end:

- quantize: q_d = CAST(floor(x_d · 1e6) AS BIGINT). float32 → double
  promotion is exact, ·1e6 is the identical IEEE double op in both
  engines, floor is unambiguous (no round-half ties to disagree on).
- distance: squared L2 in BIGINTs — Σ(q_d − c_d)², |diff| ≤ 2·10⁶ →
  per-dim ≤ 4·10¹², ×64 dims ≤ 2.6·10¹⁴ ≪ 2⁶³.
- argmin: lexicographic (dist, cid) — deterministic tie-break.
- update: c_d = floor(s_d / n) where s_d = Σ q_d (BIGINT) and n the
  cluster size. Computed as floor(double(s)/double(n)), which is
  PROVABLY exact here: s < 2⁵³ so double(s) is exact; if n | s the
  quotient is an exactly-representable integer and round-to-nearest
  returns it; if not, the rational s/n is ≥ 1/n ≥ 2·10⁻⁵ away from
  any integer while the division's rounding error is ≤ half an ulp
  at 10⁶ scale ≈ 6·10⁻¹¹ — five orders too small to cross.
- WCSS: Σ over members of dist(v, c_final) — a pure BIGINT sum,
  ≤ 5·10⁴ vectors · 2.6·10¹⁴ ≈ 1.3·10¹⁹·ε margin at sf0.1 (bounded
  by 2⁶³ through sf1; beyond that, quantize coarser or split the
  sum per sub-cluster).

Unrolled two Lloyd rounds (the fixed-iteration receipt — the loop is
round-count-agnostic): a1 = assign(c0), c1 = update(a1); a2 =
assign(c1), c2 = update(a2); report per final cluster the membership
count (under a2), the L1 mass of the final centroid c2, and the WCSS
of a2's members against c2 — exactly the k-means objective after the
second M-step. Init c0 = per-label minimum-vec_id vector (the same
deterministic seed rule as similarity.ivf_topk's coarse quantizer).

At 1000 executors: the assign pass is embarrassingly parallel
(WholeStageCodegen over array intrinsics, centroids as literals —
no broadcast even needed at k·d = 640 values); the update groupBy
shuffles k·d·P partial rows, not the corpus. The quantized corpus is
localCheckpointed once (at 100 TB: persist the quantized projection
to parquet and share it across rounds — same plan shape).

Reference tie-in: the Go crawler has no vector stage; this is
pipeline-extension territory (SURVEY §2 X-table) alongside
similarity.py's ANN/IVF operators, which share the label-seeded
deterministic init.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

#: micro-unit quantization scale (see module docstring).
SCALE = 1_000_000


def quantize(embeddings: DataFrame) -> DataFrame:
    """(vec_id, label, q): embeddings quantized to BIGINT micro-units
    via floor — the only rounding mode with no tie cases, so Spark
    and any oracle agree bit-for-bit."""
    return embeddings.select(
        "vec_id",
        "label",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * SCALE).cast("long"),
        ).alias("q"),
    )


def seed_centroids(quant: DataFrame) -> list[tuple[int, list[int]]]:
    """c0: per label, the quantized vector with the minimum vec_id —
    deterministic, spread across the label structure (ivf_topk's seed
    rule). Returns driver-side [(cid, [d ints])] sorted by cid."""
    w = Window.partitionBy("label").orderBy("vec_id")
    rows = (
        quant.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select(F.col("label").cast("long").alias("cid"), "q")
        .collect()
    )
    return sorted((int(r["cid"]), [int(v) for v in r["q"]]) for r in rows)


def _dist_to(c_vals: list[int]):
    """Exact BIGINT squared-L2 distance from column `q` to the literal
    centroid `c_vals` (no join: the model rides in the expression)."""
    arr = F.array(*[F.lit(int(v)).cast("long") for v in c_vals])
    return F.aggregate(
        F.zip_with("q", arr, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def assign(quant: DataFrame,
           cents: list[tuple[int, list[int]]]) -> DataFrame:
    """One E-step: adds `cid` (argmin centroid, tie-break (dist, cid)
    lexicographic via a struct-least — one projection, zero shuffles)."""
    packed = [
        F.struct(
            _dist_to(c).alias("d"),
            F.lit(int(cid)).cast("long").alias("c"),
        )
        for cid, c in cents
    ]
    best = F.least(*packed) if len(packed) > 1 else packed[0]
    return quant.withColumn("cid", best["c"])


def update(assigned: DataFrame) -> list[tuple[int, list[int]]]:
    """One M-step: per-(cid, dim) BIGINT sums + counts (the k·d-row
    map-side-combining groupBy), floor-mean per dim (exactness proof
    in the module docstring), collected as the next round's model."""
    rows = (
        assigned.select("cid", F.posexplode("q").alias("pos", "qd"))
        .groupBy("cid", "pos")
        .agg(F.sum("qd").alias("s"), F.count("*").alias("n"))
        .select(
            "cid", "pos",
            F.floor(F.col("s") / F.col("n")).cast("long").alias("cd"),
        )
        .collect()
    )
    by_cid: dict[int, dict[int, int]] = {}
    for r in rows:
        by_cid.setdefault(int(r["cid"]), {})[int(r["pos"])] = int(r["cd"])
    return sorted(
        (cid, [dims[p] for p in sorted(dims)])
        for cid, dims in by_cid.items()
    )


def kmeans_clusters(embeddings: DataFrame,
                    n_iters: int = 2) -> DataFrame:
    """(cid, n_vecs, c_l1, wcss): the exact-integer Lloyd receipt —
    final cluster sizes, the L1 mass of each final centroid, and the
    within-cluster sum of squared (quantized) distances to it. All
    BIGINT; bit-identical across engines and partitionings."""
    spark = embeddings.sparkSession
    quant = quantize(embeddings).localCheckpoint(eager=True)
    cents = seed_centroids(quant)
    assigned = None
    for _ in range(n_iters):
        assigned = assign(quant, cents)
        cents = update(assigned)
    cdf = spark.createDataFrame(
        [(cid, c, sum(abs(v) for v in c)) for cid, c in cents],
        schema="cid long, c array<long>, c_l1 long",
    )
    d_final = F.aggregate(
        F.zip_with("q", "c", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        assigned.join(F.broadcast(cdf), "cid")
        .withColumn("d2", d_final)
        .groupBy("cid")
        .agg(
            F.count("*").alias("n_vecs"),
            F.min("c_l1").alias("c_l1"),
            F.sum("d2").alias("wcss"),
        )
        .select("cid", "n_vecs", "c_l1", "wcss")
        .orderBy("cid")
    )
