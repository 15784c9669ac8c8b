"""Character-entropy quality signal (X141).

The Gopher/C4 rule batteries (X30/X33) and the classifiers
(X37/X125) assume text that is at least TEXT; the classic cheap
screen for the stuff that is not — base64 blobs, minified JS,
binary-in-UTF8, key-mash spam, single-char padding — is Shannon
entropy of the character distribution: repetitive padding sits near
0 nats, natural language in a band (~2.5–4.2 nats for a
letters+space alphabet), and random/encoded bytes push toward
ln(alphabet). Both tails are quality-gate evidence, which is why
entropy screens appear in practically every web-corpus cleaning
stack alongside the rule batteries.

Exactness (the repo's micro-nat discipline): H = ln N −
(Σ_c n_c·ln n_c)/N over char counts n_c. Each per-char term
n_c·ln(n_c) rounds ONCE to BIGINT micro-nats, so the sum is an
order-independent integer; the division by N is integer floor; the
ln N term rounds once. entropy_micro is therefore deterministic
under any partitioning and bit-identical in DuckDB (documented
semantics: micro-nats, per-term rounded — within 1 micro-nat of the
real-valued H per distinct char, which is noise against the
0.5-nat-wide decision bands).

Distributed shape: ONE explode to (doc_id, char) rows — linear in
corpus chars, map-side combinable — ONE (doc_id, char) groupBy, ONE
doc groupBy folding the entropy terms, then a LEFT join back so
empty docs report zeros. No windows, no UDFs, no float crossing a
shuffle (only the rounded BIGINT terms aggregate).

Reference tie-in: the Go crawler has no content-quality screen
beyond push counts (crawler.go:117); entropy gating is
pipeline-extension territory (SURVEY §2 X-table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: decision bands (micro-nats): below LOW = padding/repetition,
#: above HIGH = random/encoded (ln 66 ≈ 4.19 — beyond any natural
#: letters+digits+punct mix).
LOW_MICRO = 1_500_000
HIGH_MICRO = 4_200_000


def char_entropy(docs: DataFrame) -> DataFrame:
    """(doc_id, n_chars, n_distinct_chars, entropy_micro, is_low,
    is_high) for every document; empty docs report zeros and flag
    is_low. Ordered by doc_id."""
    chars = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(1),
                    F.greatest(F.char_length("text"), F.lit(1)),
                ),
                lambda i: F.substring(
                    F.col("text"), i.cast("int"), F.lit(1)
                ),
            )
        ).alias("ch"),
    ).filter(F.col("ch") != "")
    counts = chars.groupBy("doc_id", "ch").agg(
        F.count("*").alias("c")
    )
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_chars"),
        F.count("*").cast("long").alias("n_distinct_chars"),
        F.sum(
            F.round(
                F.col("c").cast("double")
                * F.log(F.col("c").cast("double")) * 1_000_000, 0
            ).cast("long")
        ).alias("terms"),
    )
    ent = (
        F.round(F.log(F.col("n_chars").cast("double")) * 1_000_000, 0)
        .cast("long")
        - F.expr("terms DIV n_chars")
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_chars", F.lit(0)).cast("long").alias("n_chars"),
            F.coalesce("n_distinct_chars", F.lit(0)).cast("long")
            .alias("n_distinct_chars"),
            F.coalesce(ent, F.lit(0)).cast("long").alias("entropy_micro"),
            (F.coalesce(ent, F.lit(0)) < LOW_MICRO).alias("is_low"),
            (F.coalesce(ent, F.lit(0)) > HIGH_MICRO).alias("is_high"),
        )
        .orderBy("doc_id")
    )
