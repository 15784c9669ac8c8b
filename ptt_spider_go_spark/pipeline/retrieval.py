"""Distributed BM25 retrieval over an inverted index (X120).

Every serious curation pipeline eventually needs targeted retrieval
over the corpus it is building: "find the documents most similar to
this eval prompt" (contamination triage), "pull the top matches for
this seed set" (quality-classifier bootstrapping, DSIR target
expansion), "which pages answer this query" (search-engine-style
relevance audits). The standard lexical ranker for all of these is
BM25 (Robertson & Zaragoza, 2009) over an inverted index — the exact
shape Lucene/Elasticsearch materialize, re-expressed here as three
narrow relations a 1000-executor job builds in two shuffles:

    postings : (term, doc_id, tf)       one explode + one groupBy
    lens     : (doc_id, dl)             zero shuffles (projection)
    dfs      : (term, df, idf_micro)    groupBy over postings
                                        (map-side combine; orders
                                        smaller than the corpus)

Scoring a query batch is then: broadcast the (tiny) query-term
relation against `postings` [equi-join on term], one groupBy
(q_id, doc_id), and a PARTITIONED top-k window per query — never a
global sort, never an all-pairs product. The corpus is touched
exactly twice (postings build + lens), both full-scan-then-shuffle
passes any 100 TB job already pays for tokenization.

Oracle-exact float strategy (the lm.py micro-nats discipline):

- idf: Lucene's non-negative form ln(1 + (N - df + ½)/(df + ½))
  simplifies to ln((2N+2)/(2df+1)) — the argument is one exact IEEE
  division of two integer-exact doubles, so the transcendental sees
  the identical input in Spark and DuckDB; it is rounded ONCE to
  integer micro-nats at the distinct-term level (dfs is the only
  relation that ever sees a log).
- tf saturation: with k1 = 6/5 and b = 3/4 the classic
  tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)) is the exact rational

        22·tf·S / (10·tf·S + 3·S + 9·dl·N)          (avgdl = S/N)

  of BIGINTs (S = corpus token count, N = corpus doc count; the
  numerator stays < 2^53 through sf100 — for a true 100 TB run the
  same expression holds in doubles with ~1-ulp noise, which the
  micro-quantization below absorbs).
- each (term, doc) contribution is round(idf_micro · tf_comp) cast
  to BIGINT, so the per-(query, doc) score is a pure BIGINT sum —
  exact, order-independent, bit-identical across engines.

Reference tie-in: the Go crawler ranks pages only by (page desc,
pos) (`scheduler.go` work-queue order); relevance ranking over the
fetched corpus is pipeline-extension territory (SURVEY §2 X-table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ptt_spider_go_spark.pipeline.common import tokens

#: BM25 constants as exact rationals: k1 = 6/5, b = 3/4 (the
#: textbook defaults). Folded into the integer coefficients below —
#: see module docstring for the derivation.
K1_NUM, K1_DEN = 6, 5
B_NUM, B_DEN = 3, 4


def bm25_index(docs: DataFrame) -> dict[str, DataFrame | int]:
    """Build the inverted index. Returns 'postings' (term, doc_id,
    tf), 'lens' (doc_id, dl), 'dfs' (term, df, idf_micro), plus the
    two corpus scalars 'n_docs' and 'sum_dl' (one driver probe over a
    two-column partial-agg projection — the approved scalar idiom; a
    1-row crossJoin would funnel an Exchange SinglePartition into
    every downstream plan)."""
    toked = docs.select(
        "doc_id", tokens(F.col("text")).alias("toks")
    )
    lens = toked.select(
        "doc_id", F.size("toks").cast("long").alias("dl")
    )
    postings = (
        toked.select("doc_id", F.explode("toks").alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    probe = lens.agg(
        F.count("*").alias("n"), F.sum("dl").alias("s")
    ).collect()[0]
    n_docs, sum_dl = int(probe["n"]), int(probe["s"] or 0)
    # idf_micro = round(ln((2N+2)/(2df+1)) * 1e6): the ln argument is
    # an exact IEEE division of integer-exact doubles; rounded once
    # here so scoring never touches a float aggregation.
    dfs = (
        postings.groupBy("term")
        .agg(F.count("*").alias("df"))
        .select(
            "term", "df",
            F.round(
                F.log(
                    F.lit(2 * n_docs + 2)
                    / (F.lit(2) * F.col("df") + F.lit(1))
                ) * 1_000_000,
                0,
            ).cast("long").alias("idf_micro"),
        )
    )
    return {
        "postings": postings, "lens": lens, "dfs": dfs,
        "n_docs": n_docs, "sum_dl": sum_dl,
    }


def query_terms(docs: DataFrame, modulus: int = 97,
                first_k: int = 8) -> DataFrame:
    """(q_id, term): the query relation — each eval-style document
    (doc_id % modulus == 0, the established eval-holdout convention)
    contributes the distinct terms among its first `first_k` tokens.
    min-position via one groupBy; the relation is O(|eval| · first_k)
    rows — broadcast-sized by construction."""
    toked = docs.filter(
        F.col("doc_id") % modulus == 0
    ).select(F.col("doc_id").alias("q_id"),
             tokens(F.col("text")).alias("toks"))
    pos = toked.select(
        "q_id",
        F.posexplode("toks").alias("pos", "term"),
    )
    return (
        pos.groupBy("q_id", "term")
        .agg(F.min("pos").alias("first_pos"))
        .filter(F.col("first_pos") < first_k)
        .select("q_id", "term")
    )


def bm25_topk(docs: DataFrame, k: int = 5, modulus: int = 97,
              first_k: int = 8) -> DataFrame:
    """(q_id, rank, doc_id, score_micro): the top-k BM25 matches per
    query (query docs themselves excluded — retrieval over a holdout
    never returns the probe). Ties break on doc_id ascending so the
    ranking is total. Queries whose terms miss the corpus entirely
    (or that are all-whitespace) yield no rows, matching what an
    inverted index can say about them.

    Plan shape: broadcast(query_terms) ⋈ postings on term [the only
    corpus-sized stage]; BIGINT contribution sum per (q_id, doc_id);
    top-k via a window PARTITIONED by q_id (tiebreak doc_id) — no
    global sort anywhere."""
    idx = bm25_index(docs)
    n, s = idx["n_docs"], idx["sum_dl"]
    qt = query_terms(docs, modulus=modulus, first_k=first_k)
    # 22·tf·S / (10·tf·S + 3·S + 9·dl·N): exact BIGINTs into one IEEE
    # division; times the BIGINT idf, rounded ONCE to micro units.
    tf_num = F.lit(22) * F.col("tf") * F.lit(s)
    tf_den = (
        F.lit(10) * F.col("tf") * F.lit(s)
        + F.lit(3 * s)
        + F.lit(9 * n) * F.col("dl")
    )
    contrib = F.round(
        F.col("idf_micro") * (tf_num / tf_den), 0
    ).cast("long")
    scored = (
        idx["postings"]
        .join(F.broadcast(qt), "term")
        .filter(F.col("doc_id") != F.col("q_id"))
        .join(idx["lens"], "doc_id")
        .join(idx["dfs"].select("term", "idf_micro"), "term")
        .groupBy("q_id", "doc_id")
        .agg(F.sum(contrib).alias("score_micro"))
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("score_micro").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", F.col("rank").cast("long").alias("rank"),
                "doc_id", "score_micro")
    )


#: planted-copy id offset — ≡ 77 (mod 97), so planted docs can never
#: enter the query holdout themselves.
EVAL_OFFSET = 10_000_001


def bm25_eval(docs: DataFrame, k: int = 5, modulus: int = 97,
              first_k: int = 8) -> DataFrame:
    """One-row retrieval-quality receipt for X120 (X144): plant a
    truncated copy (first 3/5 of tokens, re-ID'd at doc_id +
    EVAL_OFFSET) of every eval-holdout doc into the corpus, run the
    standard bm25_topk, and score whether the ranker finds the
    planted copy — the self-validating IR eval (known ground truth
    by construction, the planted-relevant protocol) a release runs
    before trusting BM25-driven contamination triage or seed-set
    expansion.

    Columns: n_queries, hits_at_1, hits_at_5 (planted copy retrieved
    at rank 1 / within k), mrr_ppm = (Σ_q 10^6 DIV rank_q) DIV
    n_queries with rank_q the planted copy's rank (missing -> 0
    contribution) — the integer-exact MRR definition (documented:
    reciprocal ranks floor to ppm before averaging, and the mean
    floors again, so the receipt is BIGINT end to end and
    partitioning-invariant).

    Scale shape: one extra |eval|-sized union into the X120 plan;
    metrics are one broadcast-sized join + a 1-row aggregate."""
    holdout = docs.filter(F.col("doc_id") % modulus == 0)
    planted = holdout.select(
        tokens(F.col("text")).alias("toks"), "doc_id"
    ).select(
        (F.col("doc_id") + EVAL_OFFSET).alias("doc_id"),
        F.array_join(
            F.expr("slice(toks, 1, greatest((3 * size(toks)) DIV 5, 1))"),
            " ",
        ).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(planted)
    topk = bm25_topk(corpus, k=k, modulus=modulus, first_k=first_k)
    qrel = holdout.select(
        F.col("doc_id").alias("q_id"),
        (F.col("doc_id") + EVAL_OFFSET).alias("rel"),
    )
    found = qrel.join(
        topk.withColumnsRenamed({"doc_id": "rel"}), ["q_id", "rel"],
        "left",
    )
    return found.agg(
        F.count("*").cast("long").alias("n_queries"),
        F.coalesce(
            F.sum(F.when(F.col("rank") == 1, 1).otherwise(0)), F.lit(0)
        ).cast("long").alias("hits_at_1"),
        F.coalesce(
            F.sum(F.when(F.col("rank").isNotNull(), 1).otherwise(0)),
            F.lit(0),
        ).cast("long").alias("hits_at_5"),
        F.expr(
            "CAST(CASE WHEN count(*) = 0 THEN 0"
            " ELSE coalesce(sum(1000000 DIV rank), 0) DIV count(*)"
            " END AS BIGINT)"
        ).alias("mrr_ppm"),
    )
