"""jusText-style context-sensitive line classification.

The cross-document cuts (X25 segment dedup, X69 common lines) miss
boilerplate that is unique per page — navigation crumbs, cookie
banners, footer legalese that embeds the page title. jusText
(Pomikálek 2011, the extractor behind many CommonCrawl-derived
corpora) classifies each block by INTRINSIC features — length and
stop-word density — then lets confident neighbours rescue borderline
blocks. This is that classifier, relational, over newline-split lines:

context-free pass (per line, no neighbours):
- fewer than `length_low` tokens            -> 'short'
- stopword density >= sw_milli/1000 and
  at least `length_high` tokens             -> 'good'
- dense enough but under `length_high`      -> 'near_good'
- everything else                           -> 'bad'

context-sensitive pass: 'short'/'near_good' lines become 'good' iff an
adjacent line is context-free 'good' (one lag + one lead over the
per-document window — the simplified form of jusText's "surrounded by
good" rule); 'good'/'bad' are final. kept = final class == 'good'.

Exactness: the density test is the integer cross-multiplication
`sw_cnt * 1000 >= n_tok * sw_milli` — no division, no floats, so the
DuckDB oracle matches bit-for-bit. NULL lag/lead at document edges
three-valued-logics to the 'bad' branch in both engines.

Scale shape: split + posexplode (narrow), token/stopword counts as
JVM higher-order functions on the exploded line (no UDF, text crosses
no shuffle except partitioned by doc_id for the window, which is
bounded by lines-per-document — never corpus-wide). One window, one
projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

#: tiny English function-word list — enough for the density signal;
#: callers pass their own per-language list in production.
JUSTEXT_STOPWORDS = (
    "the", "is", "of", "and", "it", "for", "a", "to", "in", "this",
)


def justext_lines(docs: DataFrame,
                  stopwords=JUSTEXT_STOPWORDS,
                  length_low: int = 3,
                  length_high: int = 8,
                  sw_milli: int = 300) -> DataFrame:
    """(doc_id, pos, line, n_tok, sw_cnt, ctx_class, cls, kept) for
    every newline-split line of every document."""
    sw = F.array(*[F.lit(w) for w in stopwords])
    lines = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), "\n")).alias("pos", "line"),
    )
    toks = F.filter(F.split(F.trim(F.col("line")), r"\s+"),
                    lambda x: x != F.lit(""))
    ltoks = F.filter(F.split(F.trim(F.lower(F.col("line"))), r"\s+"),
                     lambda x: x != F.lit(""))
    scored = lines.select(
        "doc_id", F.col("pos").cast("int").alias("pos"), "line",
        F.size(toks).cast("int").alias("n_tok"),
        F.size(F.filter(ltoks, lambda x: F.array_contains(sw, x)))
        .cast("int").alias("sw_cnt"),
    )
    dense = (F.col("sw_cnt") * 1000 >= F.col("n_tok") * F.lit(sw_milli))
    ctx = (
        F.when(F.col("n_tok") < length_low, F.lit("short"))
        .when(dense & (F.col("n_tok") >= length_high), F.lit("good"))
        .when(dense, F.lit("near_good"))
        .otherwise(F.lit("bad"))
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    with_ctx = scored.withColumn("ctx_class", ctx)
    prev = F.lag("ctx_class").over(w)
    nxt = F.lead("ctx_class").over(w)
    cls = (
        F.when(F.col("ctx_class").isin("good", "bad"),
               F.col("ctx_class"))
        .when((prev == "good") | (nxt == "good"), F.lit("good"))
        .otherwise(F.lit("bad"))
    )
    return with_ctx.select(
        "doc_id", "pos", "line", "n_tok", "sw_cnt", "ctx_class",
        cls.alias("cls"),
        (cls == "good").alias("kept"),
    )
