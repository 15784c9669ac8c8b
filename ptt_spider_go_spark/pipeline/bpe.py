"""Distributed BPE-style merge training at token granularity (phrase
mining).

The byte-pair-encoding training loop (Sennrich et al., 2016; the
SentencePiece/GPT tokenizer family) is: count adjacent symbol pairs,
merge the most frequent pair everywhere, repeat. Production tokenizers
train on a corpus sample single-node; at 100 TB the counting passes ARE
the cost, and they distribute perfectly — each round is one narrow
pair-explode + map-side-combining groupBy + a global top-1 (TakeOrdered,
no window), then a per-document left-to-right greedy fold applying the
merge. This module runs that loop at TOKEN granularity (merging
frequent adjacent word pairs into phrase symbols — word-level BPE /
phrase mining); the machinery is granularity-agnostic.

Exactness: the fold is the classic greedy non-overlapping left-to-right
merge — 'a a a' with merge (a,a) yields ['a+a', 'a'] — implemented as
an exact string fold (aggregate over the symbol array with a
space-delimited accumulator; symbols never contain spaces by
construction). Ties in pair counts break lexicographically on
(left, right), so the whole training run is deterministic and the
DuckDB oracle (list_reduce with the same fold) reproduces every round
bit-for-bit.

Scale shape per round: pair stream (one explode, guarded against <2
symbol docs) -> groupBy(a, b) count [shuffle, map-side partial] ->
orderBy+limit(1) argmax (driver probe of ONE row — the merge-table
model is n_merges rows, the approved scalar-probe idiom) -> one
projection applying the fold with the pair as literals. No caching
needed at small merge counts; for deep vocabularies, localCheckpoint
per round (as the connected-components loop does) truncates the
re-fold lineage.

Merged symbols join with '+' (the corpus alphabet is '+'-free; pick
any out-of-alphabet joiner for other corpora).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ptt_spider_go_spark.pipeline.common import tokens


def _pair_stream(sym_df: DataFrame) -> DataFrame:
    """(a, b): one row per adjacent symbol pair across the corpus.
    Same descending-sequence guard as lm._bigram_stream."""
    pairs = sym_df.select(
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(1), F.greatest(F.size("syms") - 1, F.lit(1))
                ),
                lambda i: F.struct(
                    F.try_element_at("syms", i.cast("int")).alias("a"),
                    F.try_element_at("syms", (i + 1).cast("int")).alias("b"),
                ),
            )
        ).alias("p")
    )
    return pairs.select(F.col("p.a").alias("a"), F.col("p.b").alias("b")) \
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())


def _fold_apply(syms, left: str, right: str):
    """Greedy left-to-right merge of adjacent (left, right) into
    'left+right' over a symbol array column; returns the merged
    space-joined string."""
    merged = F.lit(left + "+" + right)

    def step(acc, x):
        hit = (
            (acc == F.lit(left)) | acc.endswith(F.lit(" " + left))
        ) & (x == F.lit(right))
        return F.when(
            hit,
            F.concat(
                acc.substr(F.lit(1), F.length(acc) - F.lit(len(left))),
                merged,
            ),
        ).otherwise(F.concat(acc, F.lit(" "), x))

    return F.ltrim(F.aggregate(syms, F.lit(""), step))


def phrase_merges(docs: DataFrame, n_merges: int = 3
                  ) -> tuple[DataFrame, DataFrame]:
    """Run `n_merges` BPE rounds over the whitespace-token stream.

    Returns (merge_table, applied):
    - merge_table: (step, lhs, rhs, pair_count) — the trained model,
      one row per round in training order (shorter if the corpus runs
      out of pairs);
    - applied: (doc_id, syms) — the corpus after all merges.
    """
    spark = docs.sparkSession
    cur = docs.select("doc_id", tokens(F.col("text")).alias("syms"))
    rows: list[tuple] = []
    for k in range(1, n_merges + 1):
        best = (
            _pair_stream(cur)
            .groupBy("a", "b")
            .agg(F.count("*").alias("c"))
            .orderBy(F.col("c").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, c = best[0]["a"], best[0]["b"], best[0]["c"]
        rows.append((k, a, b, int(c)))
        cur = cur.select(
            "doc_id",
            F.filter(
                F.split(_fold_apply(F.col("syms"), a, b), " "),
                lambda t: t != "",
            ).alias("syms"),
        )
    table = spark.createDataFrame(
        rows, "step int, lhs string, rhs string, pair_count long"
    )
    return table, cur
