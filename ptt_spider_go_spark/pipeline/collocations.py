"""PMI collocation / phrase mining (X126, word2phrase).

The phrase-detection pass of Mikolov et al. 2013 ("Distributed
Representations of Words and Phrases", §4 — the word2vec
`word2phrase` tool): adjacent token pairs (a, b) whose discounted
pointwise mutual information

    score(a, b) = ln( (c(a,b) − δ) · N / (c(a) · c(b)) )

clears a threshold become vocabulary phrases ("new york" ->
"new_york"). Training-data pipelines run exactly this to seed
tokenizer vocabularies and to mine multi-word entities before BPE
training (the X53/X123 trainer consumes its output ranking).

Distributed shape (the 100 TB contract): TWO counting groupBys off
one tokenized scan — unigram counts (vocab-sized) and adjacent-bigram
counts (bigram-vocab-sized), both map-side combinable; ONE scalar
probe for the token total N; then bigram counts join unigram counts
twice on the raw token (hash joins on vocab-sized relations; AQE
broadcasts the unigram side when it measures small). The min-count
filter prunes the bigram relation BEFORE the joins — at web scale it
removes the hapax tail, which is most of the relation. Top-k by
(score DESC, a, b) is a TakeOrdered, never a global sort.

Exactness (the dsir/bm25 micro-nat discipline): with integer counts,
(c_ab − δ)·N and c_a·c_b are exact BIGINTs; each is < 2^53 whenever
the corpus token total stays under ~9.4e7 (true at every test SF —
beyond that regime, fold the identity ln(x·N/(y·z)) =
ln(x)+ln(N)−ln(y)−ln(z) over per-term doubles, same determinism, as
the module-level note in pipeline/dsir.py models). One double
division, one ln, ONE round to integer micro-nats — bit-identical in
every engine; the (score_micro DESC, a, b) ordering is a total order,
so the top-k cut is deterministic.

Reference tie-in: no analogue in the Go crawler (its text handling
stops at parse + markdown, parser_impl.go); phrase mining is
pipeline-extension territory (SURVEY §2 X-table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ptt_spider_go_spark.pipeline.common import tokens

#: word2phrase's discount — kills hapax pairs regardless of PMI.
DELTA = 1


def collocations(
    docs: DataFrame, min_count: int = 3, k: int = 100
) -> DataFrame:
    """(a, b, c_ab, c_a, c_b, score_micro): the top-`k` adjacent
    pairs by discounted PMI among pairs with c_ab >= min_count,
    ordered (score_micro DESC, a, b)."""
    toked = docs.select(tokens(F.col("text")).alias("toks"))
    # localCheckpoint: the vocab-sized unigram counts feed the scalar
    # N probe AND both sides of the scoring join — materialize once
    # instead of re-running the corpus explode+groupBy per consumer
    # (the authority_budgets/ADVICE-r04 idiom).
    uni = (
        toked.select(F.explode("toks").alias("tok"))
        .groupBy("tok").agg(F.count("*").cast("long").alias("c"))
        .localCheckpoint()
    )
    pair_arr = F.when(
        F.size("toks") >= 2,
        F.zip_with(
            F.slice("toks", 1, F.size("toks") - 1),
            F.slice("toks", 2, F.size("toks") - 1),
            lambda x, y: F.struct(x.alias("a"), y.alias("b")),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    big = (
        toked.select(F.explode(pair_arr).alias("p"))
        .select("p.a", "p.b")
        .groupBy("a", "b").agg(F.count("*").cast("long").alias("c_ab"))
        .filter(F.col("c_ab") >= F.lit(max(min_count, DELTA + 1)))
    )
    n_tok = int(uni.agg(F.sum("c")).collect()[0][0] or 0)
    scored = (
        big.join(uni.withColumnRenamed("tok", "a")
                    .withColumnRenamed("c", "c_a"), "a")
        .join(uni.withColumnRenamed("tok", "b")
                 .withColumnRenamed("c", "c_b"), "b")
        .select(
            "a", "b", "c_ab", "c_a", "c_b",
            F.round(
                F.log(
                    ((F.col("c_ab") - DELTA) * F.lit(n_tok)).cast("double")
                    / (F.col("c_a") * F.col("c_b")).cast("double")
                ) * 1_000_000, 0,
            ).cast("long").alias("score_micro"),
        )
    )
    return scored.orderBy(
        F.col("score_micro").desc(), "a", "b"
    ).limit(k)
