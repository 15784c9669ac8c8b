"""Corpus-trained bigram language-model scoring (CCNet-style quality
signal).

CCNet (Wenzek et al., 2019) scores every Common-Crawl document with a
KenLM n-gram perplexity and keeps the head of the distribution; the
same signal ranks fluent text above boilerplate/gibberish in most
published web pipelines (CCNet, LLaMA, RedPajama). rarity_bins
(textstats.py) is the integer-domain PROXY for this; this module is the
real thing — an add-one-smoothed bigram LM trained distributively over
the corpus, scoring each document with its average token negative
log-likelihood.

Oracle-exact float strategy: a naive `sum(ln p)` per document is NOT
reproducible across engines (ln differs in the last ulp between
java.lang.Math.log and libm, and float summation order is
shuffle-dependent). Instead each DISTINCT trained bigram's log-prob is
rounded ONCE to integer micro-nats:

    nll_micro = -CAST(round(ln((c+1)/(c_prev+V)) * 1e6) AS BIGINT)

The ln argument is an exact IEEE division of integers (identical double
in both engines); only the tiny distinct-bigram relation ever sees a
transcendental, so the per-document aggregation is pure BIGINT
arithmetic — exact, order-independent, bit-identical in DuckDB. The
final avg divides two exact integers (one correctly-rounded IEEE op)
before round(., 4).

Scale shape: one explode to the bigram stream; bigram counts via
map-side-combining groupBy [shuffle]; context counts derived from the
bigram counts (no second pass over text); vocab per lang from the
distinct-unigram relation. Scoring is an equi-join of the stream
against the LM on (lang, prev, cur) — the LM relation is O(distinct
bigrams), orders smaller than the corpus, and AQE broadcasts it when
it fits. Nothing touches the driver.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F

from ptt_spider_go_spark.pipeline.common import md5_long, tokens

#: nll assigned when even the document's language is unknown to the LM:
#: p = 1/2 (one bit per token), in micro-nats.
UNSEEN_LANG_NLL_MICRO = int(round(math.log(2.0) * 1_000_000))


def _bigram_stream(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, prev, cur): one row per consecutive token pair.
    Documents with fewer than two tokens contribute no rows (the
    sequence guard keeps Spark's descending-sequence pitfall out:
    sequence(1, greatest(sz-1, 1)) is never descending, and the
    NULL-cur rows from short docs are filtered)."""
    toked = docs.select("doc_id", "lang", tokens(F.col("text")).alias("toks"))
    pairs = toked.select(
        "doc_id", "lang",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(1), F.greatest(F.size("toks") - 1, F.lit(1))
                ),
                lambda i: F.struct(
                    F.try_element_at("toks", i.cast("int")).alias("prev"),
                    F.try_element_at("toks", (i + 1).cast("int")).alias("cur"),
                ),
            )
        ).alias("bg"),
    )
    return pairs.select(
        "doc_id", "lang", F.col("bg.prev").alias("prev"),
        F.col("bg.cur").alias("cur"),
    ).filter(F.col("prev").isNotNull() & F.col("cur").isNotNull())


def train_bigram_lm(corpus: DataFrame) -> dict[str, DataFrame]:
    """Train the per-language add-one bigram LM. Returns the three
    relations scoring needs:

    - 'lm':    (lang, prev, cur, nll_micro) — smoothed bigram cost
    - 'ctx':   (lang, prev, ctx_nll_micro) — unseen-continuation
               backoff: p = 1 / (c_prev + V)
    - 'vocab': (lang, unseen_ctx_nll_micro) — unseen-context backoff:
               p = 1 / (V + 1)
    """
    bg = _bigram_stream(corpus)
    bc = bg.groupBy("lang", "prev", "cur").agg(F.count("*").alias("c"))
    cc = bc.groupBy("lang", "prev").agg(F.sum("c").alias("c_prev"))
    vv = (
        corpus.select(
            "lang", F.explode(tokens(F.col("text"))).alias("tok")
        )
        .groupBy("lang")
        .agg(F.countDistinct("tok").alias("v"))
    )

    def nll_micro(p):
        return (-F.round(F.log(p) * 1_000_000, 0)).cast("long")

    lm = (
        bc.join(cc, ["lang", "prev"])
        .join(vv, "lang")
        .select(
            "lang", "prev", "cur",
            nll_micro(
                (F.col("c") + 1) / (F.col("c_prev") + F.col("v"))
            ).alias("nll_micro"),
        )
    )
    ctx = (
        cc.join(vv, "lang")
        .select(
            "lang", "prev",
            nll_micro(
                F.lit(1) / (F.col("c_prev") + F.col("v"))
            ).alias("ctx_nll_micro"),
        )
    )
    vocab = vv.select(
        "lang",
        nll_micro(F.lit(1) / (F.col("v") + 1)).alias("unseen_ctx_nll_micro"),
    )
    return {"lm": lm, "ctx": ctx, "vocab": vocab}


def lm_scores(docs: DataFrame, lm: dict[str, DataFrame] | None = None
              ) -> DataFrame:
    """(doc_id, lang, n_bigrams, avg_nll): average per-token negative
    log-likelihood (nats, 4dp) of each document under the bigram LM —
    the CCNet ranking signal (low = fluent/head, high = gibberish/
    tail). lm=None trains on `docs` itself (the self-scoring form the
    oracle certifies); pass train_bigram_lm(reference_corpus) to score
    new batches against a fixed LM, with graceful backoff for unseen
    bigrams / contexts / languages. Documents with fewer than two
    tokens score NULL (n_bigrams = 0)."""
    if lm is None:
        lm = train_bigram_lm(docs)
    bg = _bigram_stream(docs)
    cost = F.coalesce(
        F.col("nll_micro"),
        F.col("ctx_nll_micro"),
        F.col("unseen_ctx_nll_micro"),
        F.lit(UNSEEN_LANG_NLL_MICRO).cast("long"),
    )
    scored = (
        bg.join(lm["lm"], ["lang", "prev", "cur"], "left")
        .join(lm["ctx"], ["lang", "prev"], "left")
        .join(lm["vocab"], ["lang"], "left")
        .groupBy("doc_id")
        .agg(F.sum(cost).alias("s"), F.count("*").alias("n"))
    )
    return (
        docs.select("doc_id", "lang")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id", "lang",
            F.coalesce(F.col("n"), F.lit(0).cast("long")).alias("n_bigrams"),
            F.round(
                F.col("s") / (F.col("n") * F.lit(1_000_000.0)), 4
            ).alias("avg_nll"),
        )
    )

def dsir_select(docs: DataFrame, target_col: str = "source",
                target_value: str = "src0", n_buckets: int = 4096,
                keep_frac: float = 0.25) -> DataFrame:
    """(doc_id, lang, n_feat, lambda_micro, keep): DSIR-style data
    selection via importance resampling (Xie et al., 2023) — pick the
    raw-pool documents whose hashed-n-gram feature distribution looks
    most like a high-quality target domain.

    Two add-one unigram models over hashed token buckets (the paper's
    hashed n-gram features): p_target from the docs where
    `target_col == target_value`, p_raw from the rest. Each document's
    importance is the log-likelihood ratio

        lambda(doc) = sum_tok  ln( p_target(b(tok)) / p_raw(b(tok)) )

    The per-bucket log-ratio argument is an exact rational (quotient of
    two integer-exact IEEE divisions — identical double in any engine),
    rounded ONCE to integer micro-nats at the distinct-bucket level, so
    per-document sums are exact BIGINT (same cross-engine strategy as
    lm_scores). Selection is deterministic rank-based resampling: per
    language, keep the top ceil(keep_frac * n) documents by
    (lambda desc, doc_id) — the per-language stratification keeps the
    ranking window PARTITIONED (never a global sort) and mirrors how
    production selection balances languages.

    Scale shape: one explode; one groupBy(bucket) with map-side partial
    conditional sums (the feature table is n_buckets rows — broadcast);
    token totals via a scalar driver probe over a narrow
    (is_t, size(tokens)) projection (the approved probe idiom — a
    1-row crossJoin would funnel an Exchange SinglePartition into the
    main plan); one equi-join stream x lambda on bucket; one
    groupBy(doc); one partitioned rank window. Target docs are the
    reference sample, not candidates — they are excluded from the
    output."""
    is_target = F.col(target_col) == target_value
    feat = docs.select(
        "doc_id", "lang", is_target.alias("is_t"),
        F.explode(tokens(F.col("text"))).alias("tok"),
    ).withColumn("b", F.pmod(md5_long(F.col("tok")), F.lit(n_buckets)))
    counts = feat.groupBy("b").agg(
        F.sum(F.when(F.col("is_t"), 1).otherwise(0)).alias("ct"),
        F.sum(F.when(~F.col("is_t"), 1).otherwise(0)).alias("cr"),
    )
    tot_rows = (
        docs.select(
            is_target.alias("is_t"),
            F.size(tokens(F.col("text"))).alias("n_tok"),
        )
        .groupBy("is_t")
        .agg(F.sum("n_tok").alias("n"))
        .collect()
    )
    totals = {bool(r["is_t"]): int(r["n"] or 0) for r in tot_rows}
    tt, tr = totals.get(True, 0), totals.get(False, 0)
    lam = counts.select(
        "b",
        F.round(
            F.log(
                ((F.col("ct") + 1) / F.lit(tt + n_buckets))
                / ((F.col("cr") + 1) / F.lit(tr + n_buckets))
            ) * 1_000_000,
            0,
        ).cast("long").alias("lam_micro"),
    )
    scored = (
        feat.filter(~F.col("is_t"))
        .join(F.broadcast(lam), "b")
        .groupBy("doc_id")
        .agg(F.sum("lam_micro").alias("s"), F.count("*").alias("n_feat"))
    )
    raw_docs = (
        docs.filter(~is_target)
        .select("doc_id", "lang")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id", "lang",
            F.coalesce(F.col("n_feat"), F.lit(0).cast("long"))
            .alias("n_feat"),
            F.coalesce(F.col("s"), F.lit(0).cast("long"))
            .alias("lambda_micro"),
        )
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("lambda_micro").desc(), "doc_id"
    )
    wn = Window.partitionBy("lang")
    return (
        raw_docs.withColumn("rnk", F.row_number().over(w))
        .withColumn("n_lang", F.count("*").over(wn))
        .select(
            "doc_id", "lang", "n_feat", "lambda_micro",
            (
                F.col("rnk")
                <= F.ceil(F.lit(keep_frac) * F.col("n_lang")).cast("long")
            ).alias("keep"),
        )
    )


def train_kn(corpus: DataFrame) -> dict[str, DataFrame]:
    """Interpolated Kneser-Ney bigram model (X143; Kneser & Ney 1995,
    Chen & Goodman 1999 — the canonical n-gram smoothing, upgrading
    X47's add-one baseline): absolute discount d = 3/4 moves mass
    from seen bigrams to a CONTINUATION distribution p_cont(w) ∝ how
    many distinct contexts w follows — the fix for add-one's
    over-penalty of fluent-but-unseen pairs ("San Francisco" inflates
    unigram "Francisco"; continuation counts do not).

    With per-language counts c(v,w), c(v) = Σ_w c(v,w), N1+(v·) =
    |{w : c(v,w) > 0}|, N1+(·w) = |{v : c(v,w) > 0}|, B = distinct
    bigram types, V = vocab (continuation distribution add-one
    smoothed over B+V so unseen words keep nonzero mass):

        seen ctx:   p(w|v) = [max(4c−3, 0)·(B+V) + 3·N1+(v·)·(N1+(·w)+1)]
                             / (4·c(v)·(B+V))
        unseen ctx: p(w)   = (N1+(·w)+1) / (B+V)
        unseen lang:        p = 1/2  (UNSEEN_LANG_NLL_MICRO)

    Everything left of the division is exact BIGINT (d = 3/4 folds
    into the ·4 common denominator; both sides < 2^53 while
    c·(B+V) < 9·10^15 — true for any per-language shard this engine
    trains; the lm.py micro-nat ln-sum identity covers beyond), so
    ONE double division + ONE ln + ONE micro-nat round per scored
    row keeps the DuckDB oracle bit-exact.

    Returns relations keyed for the scoring joins: 'bc' (lang, prev,
    cur, c), 'cc' (lang, prev, c_prev, n1_fwd), 'cw' (lang, cur,
    n1_back), 'sz' (lang, b_total, v).
    """
    bg = _bigram_stream(corpus)
    bc = bg.groupBy("lang", "prev", "cur").agg(F.count("*").alias("c"))
    cc = bc.groupBy("lang", "prev").agg(
        F.sum("c").alias("c_prev"), F.count("*").alias("n1_fwd")
    )
    cw = bc.groupBy("lang", "cur").agg(F.count("*").alias("n1_back"))
    sz = bc.groupBy("lang").agg(F.count("*").alias("b_total")).join(
        corpus.select(
            "lang", F.explode(tokens(F.col("text"))).alias("tok")
        ).groupBy("lang").agg(F.countDistinct("tok").alias("v")),
        "lang",
    )
    return {"bc": bc, "cc": cc, "cw": cw, "sz": sz}


def kn_scores(docs: DataFrame, lm: dict[str, DataFrame] | None = None
              ) -> DataFrame:
    """(doc_id, lang, n_bigrams, n_seen, avg_nll): average per-bigram
    Kneser-Ney negative log-likelihood (nats, 4dp) — the upgraded
    CCNet fluency signal. lm=None self-trains on `docs`; pass
    train_kn(sample) for the sample-train/score-all form (the
    contract query trains on doc_id % 3 == 0, so the backoff rungs
    are exercised under the oracle too). n_seen counts full-rung
    (seen-bigram) hits. Docs with < 2 tokens score NULL
    (n_bigrams = 0). Ordered by doc_id."""
    if lm is None:
        lm = train_kn(docs)
    bg = _bigram_stream(docs)
    j = (
        bg.join(lm["bc"], ["lang", "prev", "cur"], "left")
        .join(lm["cc"], ["lang", "prev"], "left")
        .join(lm["cw"], ["lang", "cur"], "left")
        .join(lm["sz"], ["lang"], "left")
    )
    bv = (F.col("b_total") + F.col("v")).cast("double")
    n1b1 = (F.coalesce("n1_back", F.lit(0)) + 1).cast("long")
    full_num = (
        F.greatest(4 * F.coalesce("c", F.lit(0)) - 3, F.lit(0))
        * (F.col("b_total") + F.col("v"))
        + 3 * F.col("n1_fwd") * n1b1
    ).cast("double")
    full_den = (4 * F.col("c_prev")).cast("double") * bv
    cont_num = n1b1.cast("double")
    nll = F.when(
        F.col("c_prev").isNotNull() & F.col("b_total").isNotNull(),
        (-F.round(F.log(full_num / full_den) * 1_000_000, 0))
        .cast("long"),
    ).when(
        F.col("b_total").isNotNull(),
        (-F.round(F.log(cont_num / bv) * 1_000_000, 0)).cast("long"),
    ).otherwise(F.lit(UNSEEN_LANG_NLL_MICRO).cast("long"))
    scored = j.groupBy("doc_id").agg(
        F.sum(nll).alias("s"), F.count("*").alias("n"),
        F.sum(F.when(F.col("c").isNotNull(), 1).otherwise(0))
        .cast("long").alias("n_seen"),
    )
    return (
        docs.select("doc_id", "lang")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id", "lang",
            F.coalesce("n", F.lit(0).cast("long")).alias("n_bigrams"),
            F.coalesce("n_seen", F.lit(0)).cast("long").alias("n_seen"),
            F.round(
                F.col("s") / (F.col("n") * F.lit(1_000_000.0)), 4
            ).alias("avg_nll"),
        )
        .orderBy("doc_id")
    )
