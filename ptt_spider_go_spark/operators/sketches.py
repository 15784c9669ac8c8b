"""Mergeable sketch telemetry over crawl supersteps (X111-X113).

The reference reports exact counters from one process's memory
(performance/optimizer.go keeps everything in RAM; progress totals are
exact by construction). D5/T7 reproduce those exact aggregates. At
10^10 URLs a different telemetry question appears that exact counting
answers badly: "how many DISTINCT URLs has the crawl touched so far,
per superstep and cumulatively?" Exact cumulative distinct is a full
re-shuffle of everything fetched to date — per superstep, forever.
Production crawl telemetry answers it with mergeable cardinality
sketches instead (Apache DataSketches HLL — the library Spark 3.5+
ships as `hll_sketch_agg`/`hll_union`): each superstep reduces to one
~2^lg_k-byte sketch in a single map-side-combinable aggregation, and
ANY window of supersteps is summarized by unioning sketches — no
re-scan, no re-shuffle of history, constant state per step. The same
object answers "distinct URLs this step", "cumulative through step k",
and "whole crawl" — and two crawls' telemetry merges by the same union,
which is what makes the sketch the right checkpoint/metrics artifact.

Determinism: DataSketches HLL is deterministic for a given input SET
(fixed hash, no RNG) — estimates are reproducible run to run, so tests
pin behavior (mergeability, bounded error vs exact) without tolerance
flakiness on fixed data.

Scale shape: `superstep_sketches` is ONE groupBy(superstep) whose
aggregate is the sketch build (map-side partials — executors build
sub-sketches, the combine unions them; URL strings never leave their
partition except inside sketch bytes). `cumulative_sketches` operates
on the SKETCH relation — one row per superstep, a dimension-sized
table — so its triangular step<=step join is over dozens of rows of
~KB payloads, never the fetch log. Nothing here touches the
10^10-row side twice.

Reference parity: none (extension) — the reference's counters are
crawler.go's atomic ints; the sketch layer is what those become when
one process's RAM no longer holds the crawl.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ptt_spider_go_spark.pipeline.common import md5_long

#: log2 of the HLL register count: 2^12 registers ~ 1.6% relative
#: standard error, ~2 KB per sketch — the DataSketches default tier
#: production telemetry uses.
HLL_LG_K = 12


def superstep_sketches(fetch_log: DataFrame,
                       lg_k: int = HLL_LG_K) -> DataFrame:
    """(superstep, sketch, n_exact): per-superstep HLL sketch of the
    distinct `url` values plus the exact distinct count for the same
    window. `n_exact` is affordable HERE (one superstep's slice, the
    same groupBy) — it is the CUMULATIVE exact distinct that stops
    being affordable at scale, which is exactly what the sketches
    exist to replace. One aggregation, map-side combinable on both
    columns."""
    return (
        fetch_log.groupBy("superstep")
        .agg(
            F.hll_sketch_agg("url", F.lit(lg_k)).alias("sketch"),
            F.count_distinct("url").alias("n_exact"),
        )
    )


def cumulative_sketches(sketches: DataFrame) -> DataFrame:
    """(superstep, est_step, est_cum): per-step and cumulative
    distinct-URL estimates from the sketch relation ALONE — history is
    never re-scanned; through-step-k cardinality is the union of the
    k+1 step sketches. The triangular join runs on the superstep
    dimension (one ~KB row per step), so its cost is nil at any crawl
    length that fits a schedule."""
    s = sketches.select(
        F.col("superstep").alias("_s"), F.col("sketch").alias("_sk"))
    tri = sketches.select("superstep").join(
        s, s["_s"] <= F.col("superstep"))
    return (
        tri.groupBy("superstep")
        .agg(F.hll_union_agg("_sk").alias("_u"))
        .join(
            sketches.select(
                "superstep",
                F.hll_sketch_estimate("sketch").alias("est_step")),
            "superstep",
        )
        .select(
            "superstep",
            "est_step",
            F.hll_sketch_estimate(F.col("_u")).alias("est_cum"),
        )
    )


#: default probe points for quantile telemetry, parts-per-million so
#: target ranks stay integer-exact: ceil(p*n) = (p_ppm*n + 999999) DIV 1e6.
QUANTILE_PROBS_PPM = (250_000, 500_000, 750_000, 900_000, 990_000)


def quantile_sketch_telemetry(vals: DataFrame,
                              probs_ppm=QUANTILE_PROBS_PPM,
                              accuracy: int = 1000) -> DataFrame:
    """(p_ppm, n, exact_q, rank_ok): approximate-quantile telemetry
    with its verification — the quantile twin of distinct_telemetry.
    `vals` is one numeric column `v` (e.g. document lengths: the
    distribution report every corpus release publishes).

    The production side is `percentile_approx` (Spark's
    Greenwald-Khanna sketch: mergeable across partitions, one pass,
    rank error <= n/accuracy by contract, deterministic for a given
    input). The verification side computes the EXACT quantile and the
    estimate's exact rank, and flags rank_ok when the estimate honors
    the contract:

        r_p      = ceil(p * n)                 (integer: (p_ppm*n+999999) DIV 1e6)
        exact_q  = min v with rank(v) >= r_p   (rank(v) = #{x <= v})
        rank_ok  = r_p within [#{x < est} + 1 - tol, #{x <= est} + tol],
                   tol = n DIV accuracy + 1

    (a duplicated value occupies a rank INTERVAL, and the sketch's
    guarantee is that the returned element holds SOME position within
    tolerance of the target rank — a point check against #{x <= est}
    alone falsely fails any probe landing inside a heavy value's run).

    Exactness is definitional, not borrowed: exact_q is stated as the
    min-value-reaching-rank rule so the DuckDB oracle can restate it
    verbatim instead of trusting any engine's quantile() dialect.

    Scale shape: ONE corpus shuffle (groupBy(v) — the value rollup;
    distinct lengths are a dimension, thousands of rows at any corpus
    size), then everything runs on that dimension: cumulative ranks by
    the same triangular v<=v join the sketch union uses, probe points
    broadcast onto it. n and the 5 sketch outputs are scalar driver
    probes (the authority_budgets idiom — one row each)."""
    spark = vals.sparkSession
    n = vals.count()
    probs = [int(p) for p in probs_ppm]
    if n == 0:
        return spark.createDataFrame(
            [(p, 0, None, True) for p in probs],
            "p_ppm long, n long, exact_q long, rank_ok boolean",
        )
    ests = vals.agg(
        F.percentile_approx(
            "v", [p / 1_000_000 for p in probs], F.lit(accuracy)
        ).alias("e")
    ).collect()[0]["e"]

    counts = vals.groupBy("v").agg(F.count("*").alias("c"))
    c2 = counts.select(F.col("v").alias("_v"), "c")
    cum = (
        counts.select("v")
        .join(c2, c2["_v"] <= F.col("v"))
        .groupBy("v")
        .agg(F.sum("c").alias("cum"))
        .localCheckpoint(eager=True)
    )
    probe = spark.createDataFrame(
        [(p, int(e)) for p, e in zip(probs, ests)],
        "p_ppm long, est_v long",
    ).withColumn(
        "r_p",
        # BIGINT DIV, not float '/': p_ppm*n exceeds 2^53 at 10^10 rows
        F.expr(f"(p_ppm * {int(n)}L + 999999L) DIV 1000000L"),
    )
    exact = (
        F.broadcast(probe).join(cum, cum["cum"] >= F.col("r_p"))
        .groupBy("p_ppm", "r_p", "est_v")
        .agg(F.min("v").alias("exact_q"))
    )
    est_rank = (
        F.broadcast(probe.select("p_ppm", "est_v"))
        .join(cum, cum["v"] <= F.col("est_v"), "left")
        .groupBy("p_ppm")
        .agg(
            F.coalesce(F.max("cum"), F.lit(0)).alias("est_le"),
            F.coalesce(
                F.max(F.when(cum["v"] < F.col("est_v"), F.col("cum"))),
                F.lit(0),
            ).alias("est_lt"),
        )
    )
    tol = n // accuracy + 1
    return (
        exact.join(est_rank, "p_ppm")
        .select(
            "p_ppm",
            F.lit(n).cast("long").alias("n"),
            "exact_q",
            (
                (F.col("r_p") >= F.col("est_lt") + 1 - F.lit(tol))
                & (F.col("r_p") <= F.col("est_le") + F.lit(tol))
            ).alias("rank_ok"),
        )
    )


def distinct_telemetry(fetch_log: DataFrame,
                       lg_k: int = HLL_LG_K,
                       tolerance_ppm: int = 50_000) -> DataFrame:
    """(superstep, n_exact, cum_exact, est_ok, cum_ok): the telemetry
    verification report — per-step and cumulative sketch estimates
    checked against exact distinct counts, each flagged ok when the
    estimate sits within `tolerance_ppm` (default 5%) of truth. The
    exact cumulative side is computed the EXPENSIVE way (distinct over
    the full log per step) precisely because this is the verification
    harness: a deployment reads cumulative_sketches and never pays it.

    The error check is integer-exact and symmetric:
        |est - exact| * 10^6 <= tolerance_ppm * exact
    with est rounded to the nearest long first (sketch estimates are
    doubles). DataSketches' 1-sigma RSE at lg_k=12 is ~1.6%, so 5%
    (~3 sigma) holds deterministically on fixed data."""
    sk = superstep_sketches(fetch_log, lg_k=lg_k)
    est = cumulative_sketches(sk)

    # exact cumulative distinct: url tagged with its FIRST superstep,
    # then per-step first-appearance counts accumulated by the same
    # dimension-sized triangular join the sketch union uses (no
    # partition-less window) — one distinct-shuffle total, not one
    # per step.
    firsts = (
        fetch_log.groupBy("url")
        .agg(F.min("superstep").alias("superstep"))
        .groupBy("superstep")
        .agg(F.count("*").alias("_new"))
    )
    # anchor on the sketch relation's step set: a step whose URLs all
    # appeared earlier contributes no `firsts` row but still reports.
    f2 = firsts.select(F.col("superstep").alias("_s"), "_new")
    cum = (
        sk.select("superstep")
        .join(f2, f2["_s"] <= F.col("superstep"))
        .groupBy("superstep")
        .agg(F.sum("_new").alias("cum_exact"))
    )

    def ok(est_col: str, exact_col: str) -> F.Column:
        e = F.round(F.col(est_col)).cast("long")
        x = F.col(exact_col)
        return (
            F.abs(e - x) * F.lit(1_000_000)
            <= F.lit(tolerance_ppm) * x
        )

    return (
        sk.select("superstep", "n_exact")
        .join(est, "superstep")
        .join(cum, "superstep")
        .select(
            "superstep", "n_exact", "cum_exact",
            ok("est_step", "n_exact").alias("est_ok"),
            ok("est_cum", "cum_exact").alias("cum_ok"),
        )
    )


# ---------------------------------------------------------------------------
# X113: count-min frequency-sketch telemetry — the third member of the
# sketch family (HLL = how many DISTINCT, GK = what DISTRIBUTION,
# CMS = how OFTEN each heavy key). "Which hosts dominate the fetch
# log?" answered exactly is a groupBy over an unbounded key domain —
# state proportional to the number of distinct hosts, per telemetry
# window, forever. The count-min sketch (Cormode & Muthukrishnan,
# J. Algorithms 2005) answers it in depth x width integers: cell
# (r, h_r(k)) accumulates every occurrence of k, the estimate is the
# min over the depth rows, and the sketch is LINEAR — the sketch of a
# union of streams is the cell-wise SUM of their sketches, so
# per-superstep sketches compose into any window's frequencies without
# re-scanning history (the same property that makes X111's HLL the
# right checkpoint artifact; for CMS the merge is exact, not
# approximate). Guarantees, both directions:
#   est >= exact            always (counters only ever add)
#   est <= exact + eps * N  with prob 1 - (1/e)^depth, eps = e / width
#
# Determinism / oracle strength: the row hashes are the engine's
# md5-prefix hash (pipeline/common.py), so unlike the HLL oracle
# (which pins flags and checks the exact side) the DuckDB twin
# replays the ENTIRE sketch — cells, estimates, and flags are
# bit-identical across engines, not just bounded.
#
# Scale shape: `cms_cells` is ONE groupBy whose output is the bounded
# depth x width cell dimension (map-side combinable: executors emit
# partial cell sums, never key strings). Estimation broadcasts the
# ~KB cell relation onto the probe keys. Nothing shuffles the
# unbounded key domain except as integer cell coordinates.
# ---------------------------------------------------------------------------

#: depth 4 -> error bound holds with prob 1 - e^-4 ~ 98.2%; width 512
#: -> eps = e/512 ~ 0.53% of stream mass per estimate. 4 x 512 longs =
#: 16 KB per sketch — the bounded-state point of the exercise.
CMS_DEPTH = 4
CMS_WIDTH = 512
#: seed base for the row hash family: row r salts md5 with
#: f"{CMS_SEED_BASE + r}:" (md5_long's seed convention), keeping the
#: family disjoint from every other seeded hash in the engine.
CMS_SEED_BASE = 8300


def _cms_rc(key: Column, depth: int, width: int) -> Column:
    """Array of (r, c) cell coordinates for `key`, one per sketch row."""
    return F.array(*[
        F.struct(
            F.lit(r).cast("int").alias("r"),
            F.pmod(md5_long(key, seed=CMS_SEED_BASE + r),
                   F.lit(width)).alias("c"),
        )
        for r in range(depth)
    ])


def cms_cells(rows: DataFrame, key_col: str = "key",
              depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> DataFrame:
    """(r, c, cnt): the count-min sketch of the `key_col` stream as a
    sparse cell relation (absent cell = 0). ONE aggregation over the
    bounded depth x width dimension — the explode emits integer cell
    coordinates, partial sums combine map-side, and key strings never
    leave their partition. Merging sketches = unionByName +
    groupBy(r, c).sum(cnt) — exact, because the sketch is linear."""
    return (
        rows.select(F.explode(_cms_rc(F.col(key_col), depth, width))
                    .alias("rc"))
        .select(F.col("rc.r").alias("r"), F.col("rc.c").alias("c"))
        .groupBy("r", "c")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum of CMS cell relations — the linear-sketch merge:
    cms(A ⊎ B) == cms_merge(cms(A), cms(B)) EXACTLY (pytest-pinned).
    Dimension-sized input, dimension-sized output."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("r", "c").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(cells: DataFrame, probes: DataFrame,
                 key_col: str = "key", depth: int = CMS_DEPTH,
                 width: int = CMS_WIDTH) -> DataFrame:
    """(key, est_cnt): point-frequency estimates for the probe keys —
    min over the depth rows of the probed cells, absent cell = 0 (a
    key the sketch never saw estimates 0 exactly). The cell relation
    is <= depth*width rows, so it broadcasts; the probe side never
    shuffles."""
    pc = (
        probes.select(key_col)
        .select(key_col,
                F.explode(_cms_rc(F.col(key_col), depth, width)).alias("rc"))
        .select(key_col, F.col("rc.r").alias("r"), F.col("rc.c").alias("c"))
    )
    return (
        pc.join(F.broadcast(cells), ["r", "c"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_cnt"))
    )


def cms_frequency_telemetry(rows: DataFrame, key_col: str = "key",
                            depth: int = CMS_DEPTH, width: int = CMS_WIDTH,
                            top_k: int = 10,
                            slack_num: int = 3) -> DataFrame:
    """(key, exact_cnt, est_cnt, over_ok, bound_ok): the verification
    report — heavy-hitter estimates checked against exact counts, the
    same exact-side-is-the-harness framing as distinct_telemetry (a
    deployment reads cms_estimate over merged cell sketches and never
    pays the exact groupBy). Probes are the top_k keys by
    (exact_cnt DESC, key ASC) — deterministic under ties. Flags:

        over_ok  = est >= exact                     (structural: always)
        bound_ok = (est - exact) * width <= slack_num * N

    i.e. the classic eps*N bound with eps = slack_num/width >= e/width,
    checked in BIGINT cross-multiplied form (no float division — the
    integer-exactness idiom every *_ok flag in this module uses). On
    fixed data with the fixed md5 hash family both flags are
    deterministic, and the oracle recomputes them bit-identically."""
    exact = rows.groupBy(key_col).agg(
        F.count("*").cast("long").alias("exact_cnt"))
    probes = exact.orderBy(
        F.desc("exact_cnt"), F.asc(key_col)).limit(top_k)
    cells = cms_cells(rows, key_col, depth=depth, width=width)
    est = cms_estimate(cells, probes, key_col, depth=depth, width=width)
    n = rows.count()  # scalar driver probe (the authority_budgets idiom)
    return (
        probes.join(est, key_col)
        .select(
            key_col,
            "exact_cnt",
            "est_cnt",
            (F.col("est_cnt") >= F.col("exact_cnt")).alias("over_ok"),
            ((F.col("est_cnt") - F.col("exact_cnt")) * F.lit(width)
             <= F.lit(slack_num) * F.lit(n)).alias("bound_ok"),
        )
    )


# ---------------------------------------------------------------------------
# X114: KMV / theta-style distinct sketches with SET OPERATIONS — the
# question X111's HLL cannot answer: "how many distinct URLs do two
# crawl snapshots SHARE?" HLL unions but never intersects; the
# k-minimum-values sketch (Bar-Yossef et al. 2002; Beyer et al.
# SIGMOD'07; the DataSketches theta family) supports union AND
# intersection, which is what crawl-overlap, incremental-coverage and
# dedup-planning telemetry actually need. The sketch is the k smallest
# 60-bit hash values of the distinct key set:
#
#   - all hashed values < theta (= the k-th smallest) are IN the
#     sketch, so theta is an exclusive coverage threshold and
#     n_est = floor((k-1) * 2^60 / theta)
#   - union: k smallest of the combined value sets — EXACTLY equal to
#     the sketch of the unioned streams (pytest-pinned), because the k
#     smallest of A ∪ B lie inside (k smallest of A) ∪ (k smallest of B)
#   - intersection: theta_cap = min(theta_A, theta_B); every hashed
#     distinct value < theta_cap is in BOTH sketches iff it is in both
#     sets, so m = |{v in both sketches : v < theta_cap}| and
#     n_est = floor(m * 2^60 / theta_cap)
#   - an unsaturated sketch (fewer than k distinct keys) holds the
#     WHOLE set: theta = 2^60 and every estimate is EXACT
#
# Determinism / oracle strength: the hash is md5_long (engine-
# portable) and the estimator arithmetic is IEEE-double with exact
# inputs — m * 2^60 and (k-1) * 2^60 are exact doubles (integer times
# a power of two, integer < 2^53), the divide is a single correctly-
# rounded IEEE op, and floor() removes the fraction — so Spark,
# DuckDB, and the pure-Python test mirror produce bit-identical
# estimates. Like X113 (and unlike HLL), the oracle replays the
# ENTIRE sketch.
#
# Scale shape: the build is ONE distinct-shuffle of 60-bit hashes
# (partial distinct map-side; key strings never shuffle) followed by
# TakeOrdered(k) — no global sort. Every set operation runs on k-row
# relations. Scalar reads are driver probes (the authority_budgets
# idiom).
# ---------------------------------------------------------------------------

#: RSE ~ 1/sqrt(k-2) ~ 3.1% at k=1024; the sketch is k longs (8 KB).
KMV_K = 1024
KMV_SEED = 8400
#: md5_long yields 60-bit values; the estimator maps coverage
#: fraction theta/2^60 back to cardinality.
KMV_HASH_SPACE = 1 << 60


def kmv_sketch(rows: DataFrame, key_col: str = "key",
               k: int = KMV_K) -> DataFrame:
    """(hv): the k smallest md5 hash values of the distinct keys."""
    return (
        rows.select(
            md5_long(F.col(key_col), seed=KMV_SEED).alias("hv"))
        .distinct()
        .orderBy("hv")
        .limit(k)
    )


def kmv_union(a: DataFrame, b: DataFrame, k: int = KMV_K) -> DataFrame:
    """Sketch of the union: k smallest of the combined value sets.
    EXACTLY kmv_sketch(A ∪ B) — pytest-pinned."""
    return a.unionByName(b).distinct().orderBy("hv").limit(k)


def _kmv_probe(sketch: DataFrame, k: int) -> tuple[int, int]:
    """(n_rows, theta): theta = 2^60 when unsaturated (the sketch holds
    the whole set), else the k-th smallest value. Scalar driver probe
    over a <= k-row relation."""
    row = sketch.agg(
        F.count("*").alias("n"), F.max("hv").alias("mx")).first()
    n = row["n"]
    theta = KMV_HASH_SPACE if n < k else row["mx"]
    return n, theta


def kmv_estimate(sketch: DataFrame, k: int = KMV_K) -> int:
    """Distinct-count estimate; EXACT when the sketch is unsaturated."""
    n, theta = _kmv_probe(sketch, k)
    if theta == KMV_HASH_SPACE:
        return n
    return int((k - 1) * float(KMV_HASH_SPACE) / float(theta) // 1)


def kmv_intersection_estimate(a: DataFrame, b: DataFrame,
                              k: int = KMV_K) -> int:
    """Distinct-intersection estimate from the two sketches alone.
    EXACT when both sketches are unsaturated."""
    _, ta = _kmv_probe(a, k)
    _, tb = _kmv_probe(b, k)
    theta = min(ta, tb)
    m = (
        a.join(b, "hv")
        .filter(F.col("hv") < F.lit(theta))
        .count()
        if theta < KMV_HASH_SPACE
        else a.join(b, "hv").count()
    )
    if theta == KMV_HASH_SPACE:
        return m
    return int(m * float(KMV_HASH_SPACE) / float(theta) // 1)


def kmv_overlap_telemetry(rows_a: DataFrame, rows_b: DataFrame,
                          key_col: str = "key", k: int = KMV_K,
                          tolerance_ppm: int = 100_000) -> DataFrame:
    """(metric, exact, est, est_ok) for metric in (a, b, union,
    intersection): sketch estimates of two snapshots' distinct
    cardinalities and their set algebra, verified against exact
    counts (the verification harness pays the exact distinct/join; a
    deployment reads the k-row sketches and never does). est_ok is the
    integer-ppm check every *_ok flag in this module uses; on fixed
    data with the fixed hash the whole report is deterministic and the
    oracle replays it bit-identically."""
    spark = rows_a.sparkSession
    sa = kmv_sketch(rows_a, key_col, k).localCheckpoint(eager=True)
    sb = kmv_sketch(rows_b, key_col, k).localCheckpoint(eager=True)
    da = rows_a.select(F.col(key_col).alias("key")).distinct()
    db = rows_b.select(F.col(key_col).alias("key")).distinct()
    exact = {
        "a": da.count(),
        "b": db.count(),
        "union": da.union(db).distinct().count(),
        "intersection": da.join(db, "key").count(),
    }
    est = {
        "a": kmv_estimate(sa, k),
        "b": kmv_estimate(sb, k),
        "union": kmv_estimate(kmv_union(sa, sb, k), k),
        "intersection": kmv_intersection_estimate(sa, sb, k),
    }
    rows = [
        (
            m,
            exact[m],
            est[m],
            abs(est[m] - exact[m]) * 1_000_000
            <= tolerance_ppm * exact[m],
        )
        for m in ("a", "b", "union", "intersection")
    ]
    return spark.createDataFrame(
        rows, "metric string, exact long, est long, est_ok boolean")


# ---------------------------------------------------------------------------
# X118: AMS F2 sketch — join-size estimation. The second frequency
# moment F2 = sum over keys of c_k^2 IS the self-join output size on
# that key (and the candidate-pair volume of any equality bucketing),
# so an F2 estimate prices a dedup/LSH join BEFORE running it — the
# cost-model companion to the adaptive exact-Jaccard selector, and the
# cheap detector for the Theta(n^2)-output regimes the dedup modules
# document. Exact F2 is a full groupBy over the unbounded key domain;
# the AMS sketch (Alon, Matias & Szegedy, STOC'96) replaces it with
# DEPTH integer sign-sums z_r = sum over occurrences of s_r(key),
# s_r in {-1,+1} from the engine's md5 hash family: E[z^2] = F2. The
# estimator is the classic median-of-means (GROUPS groups x BUCKET
# basic estimators; group mean is integer floor-division) for variance
# control. The sketch is LINEAR: z(A ⊎ B) = z(A) + z(B) component-wise
# — exact merge, the same superstep-composability as X113.
#
# Scale shape: the build is ONE keyless aggregate of DEPTH sums — a
# map-side partial reduce; NOTHING shuffles but the 40-integer
# partials. Key strings never leave their partition. The estimate is a
# DEPTH-row driver probe folded in arbitrary-precision Python ints (no
# overflow at any scale). Determinism: integer signs, integer sums,
# integer floor-mean, integer median — the DuckDB oracle replays all
# of it bit-exactly.
# ---------------------------------------------------------------------------

#: median of AMS_GROUPS group-means over AMS_BUCKET basic estimators
#: each: Var(group mean) <= 2 F2^2 / AMS_BUCKET, median over odd
#: AMS_GROUPS is an integer order statistic (no interpolation).
AMS_GROUPS = 5
AMS_BUCKET = 8
AMS_DEPTH = AMS_GROUPS * AMS_BUCKET
AMS_SEED_BASE = 8600


def _ams_sign(key: Column, r: int) -> Column:
    return F.lit(1) - F.lit(2) * F.pmod(
        md5_long(key, seed=AMS_SEED_BASE + r), F.lit(2))


def ams_f2_sketch(rows: DataFrame, key_col: str = "key",
                  depth: int = AMS_DEPTH) -> DataFrame:
    """(r, z): DEPTH sign-sums over the key stream — one keyless
    aggregate (map-side partial reduce, zero key shuffles), unpivoted
    to the mergeable (r, z) relation. Merging sketches = unionByName +
    groupBy(r).sum(z) — exact (linearity, pytest-pinned)."""
    key = F.col(key_col)
    agg = rows.agg(*[
        F.coalesce(F.sum(_ams_sign(key, r)), F.lit(0)).cast("long")
        .alias(f"z{r}")
        for r in range(depth)
    ])
    stack = ", ".join(f"{r}, z{r}" for r in range(depth))
    return agg.selectExpr(
        f"stack({depth}, {stack}) AS (r, z)"
    ).select(F.col("r").cast("int").alias("r"), "z")


def ams_merge(*sketches: DataFrame) -> DataFrame:
    """Component-wise sum — the linear-sketch merge (exact)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("r").agg(F.sum("z").alias("z"))


def ams_f2_estimate(sketch: DataFrame, groups: int = AMS_GROUPS,
                    bucket: int = AMS_BUCKET) -> int:
    """Median-of-means F2 estimate from the (r, z) relation — a
    DEPTH-row driver probe; Python-int arithmetic, overflow-free at
    any scale. Group g = rows bucket*g .. bucket*(g+1)-1; group mean
    is floor((sum of z^2) / bucket); estimate = middle group mean."""
    zs = {row["r"]: row["z"] for row in sketch.collect()}
    means = sorted(
        sum(zs[g * bucket + j] ** 2 for j in range(bucket)) // bucket
        for g in range(groups)
    )
    return means[groups // 2]


def ams_f2_telemetry(rows: DataFrame, key_col: str = "key",
                     groups: int = AMS_GROUPS,
                     bucket: int = AMS_BUCKET) -> DataFrame:
    """(exact_f2, est_f2, within_2x): the verification report — the
    sketch's join-size estimate next to the exact F2 (the full
    groupBy the sketch exists to replace), flagged when the estimate
    is within a factor of 2 either way (BIGINT cross-multiplied; the
    deterministic md5 signs make the flag stable on fixed data, and
    the oracle replays it bit-exactly)."""
    spark = rows.sparkSession
    exact = (
        rows.groupBy(key_col).agg(F.count("*").alias("c"))
        .agg(F.coalesce(F.sum(F.col("c") * F.col("c")), F.lit(0)))
        .first()[0]
    )
    est = ams_f2_estimate(
        ams_f2_sketch(rows, key_col, depth=groups * bucket),
        groups, bucket)
    ok = est <= 2 * exact and exact <= 2 * est
    return spark.createDataFrame(
        [(exact, est, ok)],
        "exact_f2 long, est_f2 long, within_2x boolean")


# ---------------------------------------------------------------------------
# X119: rendezvous (highest-random-weight) hashing — stable host ->
# shard assignment (Thaler & Ravishankar 1996; the scheme Kafka
# consumers, Ceph-adjacent placement, and crawler frontier routers use
# where mod-N hashing reshuffles EVERYTHING on resize). shard(key) =
# argmax over shards of h(shard, key). The property that matters for a
# long-running crawl: growing N -> M moves EXACTLY the keys the new
# shards win (every key whose argmax stays in 0..N-1 keeps its shard),
# so politeness lanes / seen-set shards / per-worker frontiers survive
# a cluster resize with 1 - N/M of nothing moving and NO coordinated
# rebalance. Mod-N moves ~(1 - 1/M) of all keys; HRW moves the
# information-theoretic minimum share in expectation.
#
# Scale shape: a PURE PROJECTION — the argmax folds an n_shards-wide
# in-row array of (score, shard) structs (array_max = lexicographic
# struct max: score first, larger shard on the measure-zero tie), zero
# shuffles, zero joins; the rebalance report adds one narrow groupBy.
# Determinism: scores are the md5 family, the tiebreak is total, and
# the DuckDB oracle replays assignment + rebalance bit-exactly
# (row_number ORDER BY score DESC, shard DESC == the struct max).
# ---------------------------------------------------------------------------

RV_SEED = 8700


def rendezvous_assign(rows: DataFrame, key_col: str = "key",
                      n_shards: int = 32) -> DataFrame:
    """(key..., shard): HRW shard assignment as an added column."""
    key = F.col(key_col)
    arr = F.array(*[
        F.struct(
            md5_long(F.concat(F.lit(f"{s}:"), key), seed=RV_SEED)
            .alias("score"),
            F.lit(s).cast("int").alias("shard"),
        )
        for s in range(n_shards)
    ])
    return rows.withColumn("shard", F.array_max(arr)["shard"])


def rendezvous_rebalance_report(rows: DataFrame, key_col: str = "key",
                                n_from: int = 8,
                                n_to: int = 10) -> DataFrame:
    """(metric, value): what a resize from n_from to n_to shards does
    to the DISTINCT key population — n_keys, n_moved, n_moved_to_new
    (moved keys whose new owner is a NEW shard; when growing,
    minimal disruption means n_moved == n_moved_to_new: nothing
    reshuffles among survivors — structural, computed genuinely,
    pytest-pinned), minimal_disruption as 0/1, and max_load_ppm_to
    (the fullest new shard's share of keys, BIGINT ppm — the balance
    half of the story)."""
    spark = rows.sparkSession
    keys = rows.select(F.col(key_col).alias("key")).distinct()
    a = rendezvous_assign(keys, "key", n_from).withColumnRenamed(
        "shard", "s_from")
    both = rendezvous_assign(a, "key", n_to).withColumnRenamed(
        "shard", "s_to").localCheckpoint(eager=True)
    n_keys = both.count()
    moved = both.filter(F.col("s_from") != F.col("s_to"))
    n_moved = moved.count()
    n_moved_new = moved.filter(F.col("s_to") >= n_from).count()
    max_load = (
        both.groupBy("s_to").agg(F.count("*").alias("c"))
        .agg(F.coalesce(F.max("c"), F.lit(0))).first()[0]
    )
    rows_out = [
        ("n_keys", n_keys),
        ("n_moved", n_moved),
        ("n_moved_to_new", n_moved_new),
        ("minimal_disruption",
         1 if (n_moved == n_moved_new and n_to >= n_from) else 0),
        ("max_load_ppm_to",
         max_load * 1_000_000 // n_keys if n_keys else 0),
    ]
    return spark.createDataFrame(rows_out, "metric string, value long")
