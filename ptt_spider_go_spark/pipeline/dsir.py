"""DSIR-style hashed n-gram importance weights (X124).

Data Selection with Importance Resampling (Xie et al., NeurIPS 2023
— the method behind quality-targeted pretraining subsets) scores
every raw document by how much more likely its features are under a
TARGET distribution than under the RAW pool:

    w(doc) = Σ_{feature occurrences} [ln p_target(b) − ln p_raw(b)]

with features hashed into B buckets (unigrams + bigrams in the
paper) and both distributions Laplace-smoothed bucket unigram
models. Docs are then selected by weight — the cheap, calibrated
alternative to training a quality classifier.

Distributed shape (the part that must survive 100 TB): ONE corpus
explode into the feature-occurrence stream (unigrams + bigrams, a
projection), ONE groupBy over the B-bucket dimension counting both
sides at once (map-side combine; output is B rows no matter the
corpus), one scalar probe for the two totals, then the per-doc score
is a BROADCAST join of the B-row log-likelihood-ratio relation onto
the feature stream + ONE doc_id groupBy. Feature strings shuffle
only inside the bucket groupBy; the scoring join moves B rows.

Exactness (the lm.py/bm25 micro-nat discipline): with integer
counts, the smoothed ratio

    p_t(b) / p_r(b) = ((ct_b + 1) · (r_tot + B)) / ((cr_b + 1) · (t_tot + B))

is an exact integer ratio; each side is < 2^53, so casting to double
and dividing once is the identical IEEE op in every engine, ln sees
the identical double, and the result is rounded ONCE per bucket to
integer micro-nats. Per-doc weights are then pure BIGINT sums of
bucket values over feature OCCURRENCES (multiplicity included, as in
the paper's unigram model) — order-independent, bit-identical across
engines and partitionings.

Target definition here: the eval-holdout convention used across this
repo (doc_id % 97 == 0 — the docs that act as quality exemplars);
raw = everything else. Both distributions come from the same single
feature-stream pass.

Relation to lm.dsir_select (X50): X50 runs the paper's pipeline over
UNIGRAM buckets with a source-designated target and finishes with
rank-based resampling. This module completes the feature model to
the paper's actual hashed n-gram space — unigrams + BIGRAMS, whose
ablation is the paper's central result (bigrams are what separate
fluent text from shuffled text) — and stops at the importance-WEIGHT
relation, the artifact any downstream resampler (X50's per-language
rank rule, textstats' priority sampler) consumes.

Reference tie-in: the Go crawler filters by push-count threshold
(crawler.go:117 via config.Push) — a popularity proxy; distribution-
level quality targeting is pipeline-extension territory (SURVEY §2
X-table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ptt_spider_go_spark.pipeline.common import md5_long, tokens

#: hashed feature buckets (the paper uses 10k for full-scale runs;
#: 512 keeps the gate tables' bucket dimension well-populated).
N_BUCKETS = 512

#: the eval-holdout target predicate modulus.
TARGET_MOD = 97


def feature_stream(docs: DataFrame) -> DataFrame:
    """(doc_id, bucket, is_target): one row per unigram/bigram
    OCCURRENCE, hashed into N_BUCKETS. Bigrams join with a space
    (tokens are whitespace-split, so the separator cannot collide
    with token content)."""
    toked = docs.select(
        "doc_id", tokens(F.col("text")).alias("toks")
    )
    uni = toked.select("doc_id", F.explode("toks").alias("f"))
    big_arr = F.when(
        F.size("toks") >= 2,
        F.zip_with(
            F.slice("toks", 1, F.size("toks") - 1),
            F.slice("toks", 2, F.size("toks") - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    big = toked.select("doc_id", F.explode(big_arr).alias("f"))
    return uni.unionByName(big).select(
        "doc_id",
        F.pmod(md5_long(F.col("f")), F.lit(N_BUCKETS)).alias("bucket"),
        (F.col("doc_id") % TARGET_MOD == 0).alias("is_target"),
    )


def bucket_llr(feats: DataFrame) -> DataFrame:
    """(bucket, ct, cr, llr_micro): both sides' occurrence counts from
    ONE B-row groupBy, plus the Laplace-smoothed log-likelihood ratio
    in micro-nats, rounded once at the bucket level."""
    counts = feats.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_target"), 1).otherwise(0))
        .cast("long").alias("ct"),
        F.sum(F.when(F.col("is_target"), 0).otherwise(1))
        .cast("long").alias("cr"),
    )
    probe = counts.agg(
        F.sum("ct").alias("tt"), F.sum("cr").alias("rt")
    ).collect()[0]
    t_tot, r_tot = int(probe["tt"] or 0), int(probe["rt"] or 0)
    num = (F.col("ct") + 1) * F.lit(r_tot + N_BUCKETS)
    den = (F.col("cr") + 1) * F.lit(t_tot + N_BUCKETS)
    return counts.select(
        "bucket", "ct", "cr",
        F.round(F.log(num.cast("double") / den.cast("double")) * 1_000_000, 0)
        .cast("long").alias("llr_micro"),
    )


def dsir_weights(docs: DataFrame) -> DataFrame:
    """(doc_id, n_feats, weight_micro): the per-document DSIR
    importance weight as an exact BIGINT micro-nat sum over the doc's
    feature occurrences (empty docs score 0). Broadcast B-row model
    join + one doc_id groupBy; ordered by doc_id."""
    feats = feature_stream(docs)
    llr = bucket_llr(feats).select("bucket", "llr_micro")
    per_doc = (
        feats.join(F.broadcast(llr), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_feats"),
            F.sum("llr_micro").alias("weight_micro"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
            F.coalesce("weight_micro", F.lit(0)).cast("long")
            .alias("weight_micro"),
        )
        .orderBy("doc_id")
    )
