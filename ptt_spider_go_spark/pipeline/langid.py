"""Trained char-n-gram language classifier: TRAIN + APPLY (X133).

X10 (`textstats.lang_id`) is the heuristic n-gram language scorer —
a fixed hand-written marker table. Real corpora (CCNet, fastText
lid.176, CLD2/CLD3, OSCAR) use a TRAINED character-n-gram model:
class-conditional char-bigram statistics fit on labeled text, applied
to every page, with the per-language confusion matrix published as
the release receipt. This module is that model, built multi-class on
the X125 Naive Bayes integer discipline.

Model: multinomial NB over char BIGRAMS of the first PREFIX_CHARS
characters of each document (lang-id saturates on a short prefix —
CLD2 samples a few hundred bytes; the cap is also the 100 TB cost
bound: the feature stream is O(docs · 255), independent of document
length). For language l with Laplace smoothing over the shared
train-gram vocabulary V:

    score_l(doc) = ln p(l) + Σ_{gram occurrences} ln p(gram | l)

Label convention (the repo's sample-train convention, as X123/X130):
docs with doc_id % 3 == 0 train, every doc is scored. The stored
`lang` column provides labels — exactly the bootstrap a real
pipeline does when it distills a heavier teacher (or metadata) into
a cheap char-gram model, then audits agreement.

Distributed shape (the 100 TB contract): TRAIN = one explode of the
sample slice's prefix bigrams -> ONE groupBy(gram) counting all |L|
classes at once (map-side combine; output vocab-sized, |L| known
from a 5-row driver probe) -> one scalar probe row per class.
APPLY = one explode of the full corpus's prefix bigrams -> ONE LEFT
broadcast join against the vocab-sized wide model -> ONE
groupBy(doc_id) summing |L| BIGINT columns. Argmax + runner-up ride
in-row on the grouped result. Token strings shuffle only into the
two gram groupBys; no windows, no all-pairs, no per-row Python.

Exactness (the lm.py/nbayes micro-nat discipline): the smoothed
likelihood (c_{g,l}+1)/(t_l+V) is an exact integer ratio with both
sides < 2^53; ONE double division + ONE ln + ONE round to integer
micro-nats per (gram, lang). OOV grams (not in V) hit the per-lang
Laplace floor ln(1/(t_l+V)), computed once the same way. Priors
ln(n_docs_l / n_train_docs) round once. Per-doc scores are pure
BIGINT sums over gram OCCURRENCES — order-independent,
partition-invariant. pred_lang is the argmax on the exact integers
with ties broken toward the lexicographically smallest language (a
total order, so the prediction is deterministic); margin_micro =
best − runner-up is exact BIGINT.

Reference tie-in: the Go crawler has no language model (PTT is
zh-only by construction); lang-aware curation is pipeline-extension
territory (SURVEY §2 X-table; X10/X31 consume the stored lang, this
operator is how that column gets made).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

#: chars of document prefix fed to the classifier (the cost bound).
PREFIX_CHARS = 256
#: sample-train convention shared with X123/X130.
SAMPLE_MOD = 3


def _gram_stream(docs: DataFrame, *cols: str) -> DataFrame:
    """(*cols, gram): one row per char-bigram OCCURRENCE of the
    first PREFIX_CHARS characters. Docs with < 2 prefix chars
    contribute no rows (sequence guard + 2-char filter, the lm.py
    descending-sequence idiom)."""
    pref = docs.select(
        *cols, F.substring(F.col("text"), 1, PREFIX_CHARS).alias("pref")
    )
    grams = pref.select(
        *cols,
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(1),
                    F.greatest(F.char_length("pref") - 1, F.lit(1)),
                ),
                lambda i: F.substring(F.col("pref"), i.cast("int"), F.lit(2)),
            )
        ).alias("gram"),
    )
    return grams.filter(F.char_length("gram") == 2)


def train_langid(docs: DataFrame) -> tuple[DataFrame, dict]:
    """Fit the char-bigram NB on the doc_id % 3 == 0 slice.

    Returns (model_wide, scalars): model_wide is the vocab-sized
    relation (gram, lp_0 .. lp_{|L|-1}) with per-class log-likelihood
    micro-nats in LANGS order; scalars carries langs (ascending),
    per-lang token totals / doc counts, prior_micro and
    floor_micro lists, and v (vocab size).
    """
    train = docs.filter(F.col("doc_id") % SAMPLE_MOD == 0)
    # driver probe #1: the class dimension (|L| rows — langs, doc
    # counts). Tiny and driver-bound by construction, the approved
    # scalar-probe idiom.
    lang_rows = (
        train.groupBy("lang").agg(F.count("*").alias("n_docs"))
        .orderBy("lang").collect()
    )
    langs = [r["lang"] for r in lang_rows]
    if not langs:
        raise ValueError("train_langid: empty training slice (no "
                         f"doc_id %% {SAMPLE_MOD} == 0 docs)")
    n_docs = {r["lang"]: int(r["n_docs"]) for r in lang_rows}
    n_train = sum(n_docs.values())

    # ONE vocab-sized groupBy counting every class at once
    # (map-side combine); localCheckpoint because the relation feeds
    # the per-class totals probe AND the model projection (the
    # ADVICE-r04 authority_budgets idiom).
    counts = (
        _gram_stream(train, "lang")
        .groupBy("gram")
        .agg(*[
            F.sum(F.when(F.col("lang") == l, 1).otherwise(0))
            .cast("long").alias(f"c_{i}")
            for i, l in enumerate(langs)
        ])
        .localCheckpoint()
    )
    # driver probe #2: per-class gram totals + vocab size (1 row).
    probe = counts.agg(
        F.count("*").alias("v"),
        *[F.sum(f"c_{i}").alias(f"t_{i}") for i in range(len(langs))],
    ).collect()[0]
    v = int(probe["v"] or 0)
    totals = [int(probe[f"t_{i}"] or 0) for i in range(len(langs))]

    prior_micro = [
        round(math.log(n_docs[l] / n_train) * 1_000_000)
        if n_train > 0 and n_docs[l] > 0 else 0
        for l in langs
    ]
    floor_micro = [
        round(math.log(1.0 / (totals[i] + v)) * 1_000_000)
        if totals[i] + v > 0 else 0
        for i in range(len(langs))
    ]
    model = counts.select(
        "gram",
        *[
            F.round(
                F.log(
                    (F.col(f"c_{i}") + 1).cast("double")
                    / F.lit(float(totals[i] + v))
                ) * 1_000_000, 0
            ).cast("long").alias(f"lp_{i}")
            for i in range(len(langs))
        ],
    )
    scalars = {
        "langs": langs, "n_docs": n_docs, "n_train": n_train, "v": v,
        "totals": totals, "prior_micro": prior_micro,
        "floor_micro": floor_micro,
    }
    return model, scalars


def langid_scores(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, pred_lang, n_grams, n_oov, score_micro,
    margin_micro, agree) for EVERY document: exact-BIGINT NB
    posterior argmax over the trained classes, ties to the
    lexicographically smallest language; margin = best − runner-up.
    Docs with no grams score exactly the priors. Ordered by doc_id.
    """
    model, s = train_langid(docs)
    langs = s["langs"]
    k = len(langs)
    # broadcast: the model is a char-bigram vocab (bounded by
    # charset², sample-trained) × |L| BIGINTs — broadcast-sized by
    # construction; keeps the corpus gram stream, the biggest
    # relation in the job, from shuffling on the gram key.
    scored = (
        _gram_stream(docs, "doc_id")
        .join(F.broadcast(model), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.when(F.col("lp_0").isNull(), 1).otherwise(0))
            .cast("long").alias("n_oov"),
            *[
                F.sum(F.coalesce(f"lp_{i}", F.lit(s["floor_micro"][i])))
                .alias(f"s_{i}")
                for i in range(k)
            ],
        )
    )
    out = docs.select("doc_id", "lang").join(scored, "doc_id", "left")
    score_cols = [
        (F.coalesce(f"s_{i}", F.lit(0)) + F.lit(s["prior_micro"][i]))
        .cast("long")
        for i in range(k)
    ]
    # argmax with lex-smallest tie-break: fold in ascending lang
    # order, replace only on STRICTLY greater — earlier (smaller)
    # langs win ties. Runner-up via sorted score array.
    best = F.struct(
        score_cols[0].alias("sc"), F.lit(langs[0]).alias("lg")
    )
    for i in range(1, k):
        cand = F.struct(score_cols[i].alias("sc"), F.lit(langs[i]).alias("lg"))
        best = F.when(score_cols[i] > best["sc"], cand).otherwise(best)
    sorted_scores = F.array_sort(F.array(*score_cols))
    runner_up = F.try_element_at(sorted_scores, F.lit(-2))
    return (
        out.select(
            "doc_id", "lang",
            best["lg"].alias("pred_lang"),
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_oov", F.lit(0)).cast("long").alias("n_oov"),
            best["sc"].alias("score_micro"),
            (
                best["sc"] - F.coalesce(runner_up, best["sc"])
            ).cast("long").alias("margin_micro"),
            (best["lg"] == F.col("lang")).alias("agree"),
        )
        .orderBy("doc_id")
    )


def langid_confusion(docs: DataFrame) -> DataFrame:
    """(lang, pred_lang, n_docs): the release confusion matrix —
    stored label × trained-model prediction, ≤|L|² rows from one tiny
    groupBy over the per-doc scores. Ordered (lang, pred_lang)."""
    return (
        langid_scores(docs)
        .groupBy("lang", "pred_lang")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .orderBy("lang", "pred_lang")
    )
