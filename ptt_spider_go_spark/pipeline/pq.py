"""Product Quantization: codebooks, codes, and ADC search (X131).

PQ (Jégou, Douze & Schmid, TPAMI 2011) is how billion-vector ANN
actually ships (FAISS IVF-PQ, ScaNN, Milvus): split the d-dim space
into M subspaces, k-means each subspace independently, and store per
vector only the M one-byte-ish codebook indices. A 64-dim float
vector collapses to M=4 codes; approximate distances come from
look-up tables (ADC — asymmetric distance computation: the query
stays exact, the database side is quantized), so scoring costs M
table lookups instead of d multiplies.

This module completes the repo's ANN family (X5–X9 brute/LSH/IVF):
IVF (similarity.ivf_topk) prunes WHICH vectors to score; PQ
compresses HOW each vector is scored. Together they are the standard
100 TB layout: coarse cells → PQ codes inside each cell.

Distributed shape: training runs the X121 exact-integer Lloyd loop
per subspace over the SLICED quantized corpus — each round one
zero-shuffle assign projection + one k·(d/M)-row map-side-combining
groupBy + the driver model probe (the approved idiom). After
training, the M codebooks are driver-side literals, so CODE
ASSIGNMENT IS ONE MAP-ONLY PROJECTION over the corpus: all M argmins
and the reconstruction error ride in the expression — zero joins,
zero shuffles, the cheapest plan class (the same reason X37/X123 are
map-only). ADC search is per-query: the M look-up tables (k values
each) fold into the expression as map literals, one narrow
projection + TakeOrdered(k) per query, unioned — never a global
sort, never an all-pairs join.

Exactness: everything rides on X121's integer discipline —
floor-quantized micro-unit dims, BIGINT squared-L2, (dist, cid)
lexicographic argmin, provably-exact floor-mean M-steps. Per-vector
reconstruction error qerr = Σ_m d_m(sub_m, codebook_m[code_m]) and
every ADC distance are pure BIGINT sums; the DuckDB oracle replays
all four training chains, the codes, and the ADC ranking bit-for-bit.

Codebook convention: M = 4 subspaces of d/M dims; per subspace k =
the label set, seeded by the label's minimum-vec_id subvector (the
X121/ivf_topk deterministic seed), two Lloyd rounds, final code =
argmin under the post-round-2 codebook.

Reference tie-in: no vector stage in the Go crawler; extension
territory (SURVEY §2 X-table), completing pipeline/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ptt_spider_go_spark.pipeline.kmeans import quantize

#: number of PQ subspaces (d must be divisible by M).
M_SUBSPACES = 4

#: query predicate for the ADC receipt (the repo-wide holdout rule).
QUERY_MOD = 97


def train_codebooks(
    quant: DataFrame, n_iters: int = 2, m_subspaces: int = M_SUBSPACES
) -> list[list[tuple[int, list[int]]]]:
    """See _train — returns the M codebooks only."""
    return _train(quant, n_iters, m_subspaces)[0]


def _train(
    quant: DataFrame, n_iters: int = 2, m_subspaces: int = M_SUBSPACES
) -> tuple[list[list[tuple[int, list[int]]]], list[tuple[int, list[int]]]]:
    """The M per-subspace codebooks, each trained with the X121 Lloyd
    loop (label-seeded init, `n_iters` rounds). Driver-side:
    (books = [[(cid, centroid_vals)] per subspace], seeds = the
    per-label minimum-vec_id FULL vectors — the same relation the
    IVF coarse quantizer uses as cell centroids).

    All M subspaces train TOGETHER, not sequentially: the seed is one
    collect of the per-label minimum-vec_id vectors (the same vector
    slices into every subspace's seed), and each Lloyd round is ONE
    job — the M zero-shuffle assign projections union into a single
    (m, cid, pos) groupBy whose output is M·k·(d/M) = k·d rows. Job
    count is 2 + n_iters regardless of M (a naive per-subspace loop
    pays M·(1 + n_iters) sequential driver probes — measured 21.5 s
    vs 16.0 s at sf0.1 on this box). The remaining wall at bench
    scale is Catalyst/codegen COMPILE of the M·k literal-centroid
    expressions (~5 s per distinct round plan, constant in data
    size): the model-in-expression trade pays a fixed per-plan
    compile to keep the corpus scan shuffle-free and join-free,
    which is the right side of the trade everywhere except toy
    inputs."""
    from pyspark.sql import Window as W

    w = W.partitionBy("label").orderBy("vec_id")
    seed_rows = (
        quant.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select(F.col("label").cast("long").alias("cid"), "q")
        .collect()
    )
    seeds = sorted((int(r["cid"]), [int(v) for v in r["q"]])
                   for r in seed_rows)
    assert seeds, "no vectors to train on"
    d = len(seeds[0][1])
    assert d % m_subspaces == 0, f"dim {d} not divisible by {m_subspaces}"
    sub_d = d // m_subspaces
    books = [
        [(cid, vec[m * sub_d:(m + 1) * sub_d]) for cid, vec in seeds]
        for m in range(m_subspaces)
    ]
    for _ in range(n_iters):
        per_m = []
        for m, cents in enumerate(books):
            packed = [
                F.struct(
                    _dist_slice(vals, m * sub_d, sub_d).alias("d"),
                    F.lit(int(cid)).cast("long").alias("c"),
                )
                for cid, vals in cents
            ]
            best = F.least(*packed) if len(packed) > 1 else packed[0]
            # two steps: resolving the struct-least field in the same
            # select as a generator (posexplode) strips the struct's
            # field aliases in Spark 4's analyzer — withColumn first
            # (the kmeans.assign pattern), then explode.
            per_m.append(
                quant.withColumn("cid", best["c"]).select(
                    F.lit(m).cast("int").alias("m"),
                    "cid",
                    F.posexplode(
                        F.slice("q", m * sub_d + 1, sub_d)
                    ).alias("pos", "qd"),
                )
            )
        allm = per_m[0]
        for p in per_m[1:]:
            allm = allm.unionByName(p)
        rows = (
            allm.groupBy("m", "cid", "pos")
            .agg(F.sum("qd").alias("s"), F.count("*").alias("n"))
            .select(
                "m", "cid", "pos",
                F.floor(F.col("s") / F.col("n")).cast("long").alias("cd"),
            )
            .collect()
        )
        by_m: dict[int, dict[int, dict[int, int]]] = {}
        for r in rows:
            by_m.setdefault(int(r["m"]), {}).setdefault(
                int(r["cid"]), {}
            )[int(r["pos"])] = int(r["cd"])
        books = [
            sorted(
                (cid, [dims[p] for p in sorted(dims)])
                for cid, dims in by_m.get(m, {}).items()
            )
            for m in range(m_subspaces)
        ]
    return books, seeds


def _dist_slice(vals: list[int], off: int, sub_d: int) -> F.Column:
    """Exact BIGINT squared L2 between q[off+1 .. off+sub_d] and the
    literal centroid `vals` — model-in-expression, no join."""
    arr = F.array(*[F.lit(int(v)).cast("long") for v in vals])
    return F.aggregate(
        F.zip_with(F.slice("q", off + 1, sub_d), arr,
                   lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def pq_codes(embeddings: DataFrame, n_iters: int = 2,
             m_subspaces: int = M_SUBSPACES) -> DataFrame:
    """(vec_id, code0..code{M-1}, qerr): every vector's PQ code under
    the trained codebooks plus its exact BIGINT reconstruction error.
    ONE map-only projection after training — all M argmins and the
    error ride in the expression."""
    quant = quantize(embeddings).localCheckpoint(eager=True)
    books = train_codebooks(quant, n_iters, m_subspaces)
    sub_d = len(books[0][0][1])
    cols: list[F.Column] = []
    err = None
    for m, cents in enumerate(books):
        packed = [
            F.struct(
                _dist_slice(vals, m * sub_d, sub_d).alias("d"),
                F.lit(int(cid)).cast("long").alias("c"),
            )
            for cid, vals in cents
        ]
        best = F.least(*packed) if len(packed) > 1 else packed[0]
        cols.append(best["c"].alias(f"code{m}"))
        err = best["d"] if err is None else err + best["d"]
    return quant.select(
        "vec_id", *cols, err.cast("long").alias("qerr")
    ).orderBy("vec_id")


def pq_adc_topk(embeddings: DataFrame, k: int = 5, n_iters: int = 2,
                m_subspaces: int = M_SUBSPACES) -> DataFrame:
    """(q_id, rank, vec_id, adc_d2, exact_d2): ADC search receipt —
    for each holdout query (vec_id % QUERY_MOD == 0), the top-k
    database vectors by ADC distance (Σ_m table_m[code_m], the
    query-vs-RECONSTRUCTION distance), with the exact quantized
    distance alongside so the approximation is auditable. Per query:
    the M k-entry look-up tables fold into the projection as map
    literals — M map lookups per vector instead of d multiplies, the
    PQ scoring shape — then TakeOrdered(k) on the (adc_d2, vec_id)
    total order; self excluded; queries unioned."""
    quant = quantize(embeddings).localCheckpoint(eager=True)
    books = train_codebooks(quant, n_iters, m_subspaces)
    sub_d = len(books[0][0][1])

    # codes + the full quantized vector (for exact_d2), one projection
    cols = []
    for m, cents in enumerate(books):
        packed = [
            F.struct(
                _dist_slice(vals, m * sub_d, sub_d).alias("d"),
                F.lit(int(cid)).cast("long").alias("c"),
            )
            for cid, vals in cents
        ]
        best = F.least(*packed) if len(packed) > 1 else packed[0]
        cols.append(best["c"].alias(f"code{m}"))
    coded = quant.select("vec_id", "q", *cols).localCheckpoint(eager=True)

    queries = sorted(
        (int(r["vec_id"]), [int(v) for v in r["q"]])
        for r in quant.filter(F.col("vec_id") % QUERY_MOD == 0)
        .select("vec_id", "q").collect()
    )

    # ONE plan, not a per-query union (r5j: the 51-branch union of
    # literal-table scans cost ~60 s of driver planning at sf0.1;
    # this broadcast-relation form is ~10x faster AND the right
    # 100 TB shape): the Python-computed per-(query, centroid) ADC
    # tables and the query vectors become SMALL broadcast relations;
    # scoring is one broadcast cross join + M broadcast table joins
    # + one partitioned top-k window. Values identical (same tables,
    # same (adc_d2, vec_id) total order).
    spark = embeddings.sparkSession
    pairs = _score_pairs(spark, coded, queries, books, sub_d)
    w_rank = F.row_number().over(
        Window.partitionBy("q_id").orderBy("adc_d2", "vec_id")
    )
    return (
        pairs.withColumn("rank", w_rank.cast("long"))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "vec_id", "adc_d2", "exact_d2")
        .orderBy("q_id", "rank")
    )


def _py_dist(a: list[int], b: list[int]) -> int:
    return sum((x - y) * (x - y) for x, y in zip(a, b))


def _score_pairs(spark, coded: DataFrame, queries, books, sub_d,
                 probes: list[tuple[int, int]] | None = None) -> DataFrame:
    """(q_id, vec_id[, cell], adc_d2, exact_d2) for every scored
    (query, vector) pair: queries and their per-subspace ADC tables
    ride as broadcast relations; `probes`, when given, restricts each
    query to its probed cells (the IVF path) via a broadcast
    (q_id, cell) equi-join instead of a cross join."""
    qrel = spark.createDataFrame(
        [(q, v) for q, v in queries], schema="q_id long, qv array<bigint>"
    )
    if probes is None:
        pairs = coded.crossJoin(F.broadcast(qrel))
    else:
        prel = spark.createDataFrame(
            probes, schema="q_id long, cell long"
        )
        pairs = coded.join(F.broadcast(prel), "cell").join(
            F.broadcast(qrel), "q_id"
        )
    pairs = pairs.filter(F.col("vec_id") != F.col("q_id"))
    for m, cents in enumerate(books):
        rows = []
        for q_id, qv in queries:
            sub_q = qv[m * sub_d:(m + 1) * sub_d]
            for cid, vals in cents:
                rows.append((q_id, int(cid), _py_dist(sub_q, vals)))
        tab = spark.createDataFrame(
            rows, schema=f"q_id long, code{m} long, d{m} long"
        )
        pairs = pairs.join(F.broadcast(tab), ["q_id", f"code{m}"])
    adc = sum(
        (F.col(f"d{m}") for m in range(1, len(books))), F.col("d0")
    )
    exact = F.aggregate(
        F.zip_with("q", "qv", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    keep = ["q_id", "vec_id"] + (["cell"] if probes is not None else [])
    return pairs.select(
        *keep, adc.cast("long").alias("adc_d2"),
        exact.cast("long").alias("exact_d2"),
    )


def ivf_pq_topk(embeddings: DataFrame, k: int = 5, n_probe: int = 2,
                n_iters: int = 2,
                m_subspaces: int = M_SUBSPACES) -> DataFrame:
    """(q_id, rank, vec_id, cell, adc_d2, exact_d2): the composed
    IVF-PQ search — the standard billion-vector layout (FAISS
    IVFADC): the coarse quantizer (label cells, centroid = the cell's
    minimum-vec_id vector — the X8/X121 seed rule, here on the
    quantized vectors under exact BIGINT L2) prunes WHICH vectors are
    scored (the n_probe nearest cells per query), PQ codes decide HOW
    (ADC table lookups). Cell selection happens DRIVER-SIDE per
    query — the coarse centroids are already collected by training,
    so probing costs zero Spark jobs; scoring touches only the probed
    cells' partitions (a partition-pruning filter on the cell key —
    on a cell-partitioned 100 TB table this skips everything else).
    Deterministic end to end: cell ranking by (L2, cell) on exact
    integers, ADC ranking by (adc_d2, vec_id); the oracle replays
    coarse selection, codebooks, tables, and ranks bit-exactly."""
    quant = quantize(embeddings).localCheckpoint(eager=True)
    books, seeds = _train(quant, n_iters, m_subspaces)
    sub_d = len(books[0][0][1])

    cols = []
    for m, cents in enumerate(books):
        packed = [
            F.struct(
                _dist_slice(vals, m * sub_d, sub_d).alias("d"),
                F.lit(int(cid)).cast("long").alias("c"),
            )
            for cid, vals in cents
        ]
        best = F.least(*packed) if len(packed) > 1 else packed[0]
        cols.append(best["c"].alias(f"code{m}"))
    coded = quant.select(
        "vec_id", F.col("label").cast("long").alias("cell"), "q", *cols
    ).localCheckpoint(eager=True)

    queries = sorted(
        (int(r["vec_id"]), [int(v) for v in r["q"]])
        for r in quant.filter(F.col("vec_id") % QUERY_MOD == 0)
        .select("vec_id", "q").collect()
    )

    # coarse probe per query: driver-side on the already-collected
    # centroids (zero Spark jobs), then ONE plan via the same
    # broadcast-relation scorer as pq_adc_topk (r5j — replacing the
    # per-query union; values identical), with the (q_id, cell)
    # probe relation restricting each query to its probed cells (the
    # partition-pruning filter at 100 TB).
    probes = []
    for q_id, qv in queries:
        probe = sorted(
            (_py_dist(qv, vec), cell) for cell, vec in seeds
        )[:n_probe]
        probes.extend((q_id, int(c)) for _d, c in probe)
    spark = embeddings.sparkSession
    pairs = _score_pairs(spark, coded, queries, books, sub_d,
                         probes=probes)
    w_rank = F.row_number().over(
        Window.partitionBy("q_id").orderBy("adc_d2", "vec_id")
    )
    return (
        pairs.withColumn("rank", w_rank.cast("long"))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "vec_id", "cell", "adc_d2", "exact_d2")
        .orderBy("q_id", "rank")
    )
