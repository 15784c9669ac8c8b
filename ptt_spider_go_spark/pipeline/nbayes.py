"""Multinomial Naive Bayes quality classifier: TRAIN + APPLY (X125).

X37 (`textstats.classifier_scores`) ships classifier INFERENCE with a
deterministic hashed stand-in weight table and documents that "a real
weight table would replace w_int with a broadcast join on the
feature". This module is that replacement: it TRAINS the weight table
from labeled exemplar documents — the cheap-classifier curation move
every modern corpus uses (FineWeb-Edu trains a quality classifier on
LLM-labeled exemplars; DCLM on OH-2.5/ELI5 positives vs raw
negatives; GPT-3/LLaMA on WebText/Wikipedia positives vs Common Crawl
negatives) — and scores the FULL corpus with it.

Model: multinomial Naive Bayes over whitespace unigrams. With
positive class P and negative class N trained on labeled docs,

    score(doc) = ln p(P)/p(N) + Σ_{token occurrences} ln p(tok|P)/p(tok|N)

with both class-conditional token models Laplace-smoothed over the
shared train vocabulary V. NB is the one classical classifier whose
training is EXACTLY a counting aggregate — which is why it is the one
that distributes perfectly (one groupBy trains it) and the one whose
oracle can be bit-exact.

Label convention (no external labels in this sandbox — the
deterministic analogue of an exemplar set): positives are the
eval-holdout docs (doc_id % 97 == 0, the repo-wide quality-exemplar
predicate, as in X50/X124), negatives are the doc_id % 97 == 1 slice
(a same-order random-looking raw sample). Every other doc is unlabeled
and only scored. A real pipeline swaps in its labeled DataFrame; the
operator shape is identical.

Distributed shape (the 100 TB contract): training is ONE explode of
the labeled slice (~2% of the corpus) -> ONE groupBy(token) counting
both classes at once (map-side combine; output is vocab-sized) ->
ONE scalar probe for the 4 totals (class token totals, vocab size,
class doc counts). Apply is ONE explode of the full corpus -> LEFT
join against the vocab-sized model relation on the raw token (hash
join; broadcast when the train slice is small — Catalyst/AQE decides
from measured size) -> ONE groupBy(doc_id). Token strings shuffle
only into the two token groupBys. No all-pairs, no windows, no
driver-side model materialization beyond 4 scalars.

Exactness (the lm.py/bm25/dsir micro-nat discipline): the smoothed
likelihood ratio

    p(tok|P)/p(tok|N) = ((cp+1) * (n_tot+V)) / ((cn+1) * (p_tot+V))

is an exact integer ratio with both sides < 2^53, so one double
division + one ln + one round to integer micro-nats per vocab term is
bit-identical in every engine. OOV tokens of scored docs hit the
Laplace floor (cp=cn=0) — a constant llr_oov computed once the same
way. The class prior ln(n_pos_docs/n_neg_docs) rounds once to
micro-nats and is added per doc. Per-doc scores are then pure BIGINT
sums over token OCCURRENCES — order-independent, partition-invariant.
`predict_pos` compares the exact integer to 0: no float near the
decision boundary.

Reference tie-in: the Go crawler's only quality gate is the
push-count threshold (crawler.go:117, config.Push); trainable
model-based gating is pipeline-extension territory (SURVEY §2,
X-table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ptt_spider_go_spark.pipeline.common import tokens

#: label predicates (eval-holdout convention shared with X50/X124).
LABEL_MOD = 97
POS_RESIDUE = 0
NEG_RESIDUE = 1


def _token_stream(docs: DataFrame) -> DataFrame:
    """(doc_id, tok): one row per unigram OCCURRENCE."""
    return docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    )


def train_nbayes(docs: DataFrame) -> tuple[DataFrame, dict[str, int]]:
    """Train on the labeled slices; return (model, scalars).

    model: (tok, cp, cn, llr_micro) — vocab-sized, one row per
    distinct train token, llr in integer micro-nats rounded once.
    scalars: p_tot/n_tot (class token totals), v (vocab size),
    prior_micro (ln(n_pos/n_neg) micro-nats), llr_oov_micro (the
    Laplace-floor llr for unseen tokens).
    """
    lab = docs.filter(
        (F.col("doc_id") % LABEL_MOD).isin(POS_RESIDUE, NEG_RESIDUE)
    ).withColumn("is_pos", F.col("doc_id") % LABEL_MOD == POS_RESIDUE)
    # localCheckpoint: the vocab-sized counts relation feeds the
    # scalar probe AND the model projection — materialize it once
    # instead of re-running the labeled explode+groupBy per consumer
    # (the authority_budgets/ADVICE-r04 idiom).
    counts = (
        lab.select("is_pos", F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(
            F.sum(F.when(F.col("is_pos"), 1).otherwise(0))
            .cast("long").alias("cp"),
            F.sum(F.when(F.col("is_pos"), 0).otherwise(1))
            .cast("long").alias("cn"),
        )
        .localCheckpoint()
    )
    probe = counts.agg(
        F.sum("cp").alias("pt"), F.sum("cn").alias("nt"),
        F.count("*").alias("v"),
    ).collect()[0]
    docs_probe = lab.agg(
        F.sum(F.when(F.col("is_pos"), 1).otherwise(0)).alias("np"),
        F.sum(F.when(F.col("is_pos"), 0).otherwise(1)).alias("nn"),
    ).collect()[0]
    p_tot, n_tot = int(probe["pt"] or 0), int(probe["nt"] or 0)
    v = int(probe["v"] or 0)
    n_pos, n_neg = int(docs_probe["np"] or 0), int(docs_probe["nn"] or 0)

    import math

    prior_micro = (
        round(math.log(n_pos / n_neg) * 1_000_000)
        if n_pos > 0 and n_neg > 0 else 0
    )
    llr_oov_micro = (
        round(math.log((n_tot + v) / (p_tot + v)) * 1_000_000)
        if v > 0 else 0
    )
    num = (F.col("cp") + 1) * F.lit(n_tot + v)
    den = (F.col("cn") + 1) * F.lit(p_tot + v)
    model = counts.select(
        "tok", "cp", "cn",
        F.round(F.log(num.cast("double") / den.cast("double")) * 1_000_000, 0)
        .cast("long").alias("llr_micro"),
    )
    scalars = {
        "p_tot": p_tot, "n_tot": n_tot, "v": v,
        "n_pos": n_pos, "n_neg": n_neg,
        "prior_micro": prior_micro, "llr_oov_micro": llr_oov_micro,
    }
    return model, scalars


def nbayes_scores(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_oov, score_micro, predict_pos) for EVERY
    document: exact-BIGINT NB log-odds (prior + per-occurrence llr,
    OOV at the Laplace floor); predict_pos compares the integer to 0.
    Ordered by doc_id."""
    model, s = train_nbayes(docs)
    toks = _token_stream(docs)
    # broadcast: the model is sample-trained (vocab of the ~2% labeled
    # slice), so it is broadcast-bounded by construction; broadcasting
    # keeps the corpus token stream — the biggest relation in the job —
    # from shuffling on the token key (a giant-vocab model would flip
    # this to a shuffle join, trading one corpus exchange for it).
    scored = (
        toks.join(F.broadcast(model.select("tok", "llr_micro")),
                  "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.when(F.col("llr_micro").isNull(), 1).otherwise(0))
            .cast("long").alias("n_oov"),
            F.sum(F.coalesce("llr_micro", F.lit(s["llr_oov_micro"])))
            .alias("sum_llr"),
        )
    )
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("n_oov", F.lit(0)).cast("long").alias("n_oov"),
            (F.coalesce("sum_llr", F.lit(0)) + F.lit(s["prior_micro"]))
            .cast("long").alias("score_micro"),
            (
                F.coalesce("sum_llr", F.lit(0)) + F.lit(s["prior_micro"]) > 0
            ).alias("predict_pos"),
        )
        .orderBy("doc_id")
    )
