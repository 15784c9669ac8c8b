"""End-to-end curation funnel: the survival report every production
corpus pipeline publishes (C4, Gopher §A1, RefinedWeb table 2,
FineWeb's ablation ladder all report exactly this table) — how many
documents and how much token mass survive each successive cleaning
gate. The stage ORDER is part of the contract: rule filters first
(cheapest, projection-only), then exact dedup, then decontamination,
then the model-based classifier — the cost-ascending order a 100 TB
run wants, since each stage only pays for the previous stages'
survivors.

Stages (cumulative — a doc counts at stage k iff it passed 1..k):
  1 raw            every document
  2 gopher         Gopher rule battery (textstats.gopher_quality)
  3 c4             C4 cleaning rules (textstats.c4_rules)
  4 repetition     full Gopher repetition battery (X42)
  5 exact_dedup    keeper (min doc_id) of its md5(text) group
  6 decontaminated in the training split and 13-gram-clean (X26;
                   the eval carve-out drops here by definition)
  7 classifier     hashed linear classifier keep (X37)

Scale shape: each gate is its own already-audited narrow plan joined
back on doc_id; the funnel adds ONE explode (7 stage rows per doc,
booleans + one int) and ONE tiny groupBy(stage). No text crosses the
funnel's own shuffles.

Reference parity: no analogue in the reference (extension X43); the
DuckDB oracle nests the component oracles verbatim, so the funnel is
certified by composition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ptt_spider_go_spark.pipeline import dedup_text, textstats
from ptt_spider_go_spark.pipeline.common import tokens

STAGES = [
    "raw", "gopher", "c4", "repetition",
    "exact_dedup", "decontaminated", "classifier",
]


def corpus_funnel(docs: DataFrame, normalize: bool = False) -> DataFrame:
    """(stage_id, stage, n_docs, n_tokens): cumulative survivors and
    their exact token mass after each curation gate (module
    docstring).

    `normalize=True` (default off — pinned outputs untouched) routes
    the corpus through the X61 canonical normalization (NFC + control
    strip + ws collapse) BEFORE every gate, so NFC-divergent duplicates
    merge at the exact-dedup stage instead of both surviving (VERDICT
    r04 next-round #6). The flag substitutes the normalized column
    expression into each gate's scan projection; a production run
    materializes textstats.with_normalized_text once instead of paying
    the (Arrow-batched) NFC hop per gate."""
    if normalize:
        docs = textstats.with_normalized_text(docs)
    nt = docs.select(
        "doc_id", F.size(tokens(F.col("text"))).alias("n_tokens"),
        F.md5("text").alias("text_hash"),
    )
    gop = textstats.gopher_quality(docs).select("doc_id", "passes_gopher")
    c4 = textstats.c4_rules(docs).select("doc_id", "passes_c4")
    rep = textstats.repetition_battery(docs).select(
        "doc_id", "passes_repetition")
    keepers = dedup_text.exact_dup_groups(docs).select(
        "text_hash", "keeper_doc_id")
    dec = dedup_text.decontaminate(docs).select("doc_id", "is_contaminated")
    clf = textstats.classifier_scores(docs).select("doc_id", "keep")

    flags = (
        nt.join(gop, "doc_id").join(c4, "doc_id").join(rep, "doc_id")
        .join(keepers, "text_hash")
        .join(dec, "doc_id", "left")   # eval carve-out docs: no row
        .join(clf, "doc_id")
    )
    c2 = F.col("passes_gopher")
    c3 = c2 & F.col("passes_c4")
    c4s = c3 & F.col("passes_repetition")
    c5 = c4s & (F.col("doc_id") == F.col("keeper_doc_id"))
    c6 = c5 & F.coalesce(~F.col("is_contaminated"), F.lit(False))
    c7 = c6 & F.col("keep")
    survs = [F.lit(True), c2, c3, c4s, c5, c6, c7]
    stage_rows = F.explode(F.array(*[
        F.struct(
            F.lit(i + 1).alias("stage_id"),
            F.lit(name).alias("stage"),
            surv.alias("surv"),
        )
        for i, (name, surv) in enumerate(zip(STAGES, survs))
    ])).alias("st")
    # every doc emits every stage row (surv as data, not a filter) so
    # a stage that kills the whole corpus still reports a 0 row — a
    # funnel table always has all 7 stages
    return (
        flags.select("n_tokens", stage_rows)
        .groupBy(F.col("st.stage_id").alias("stage_id"),
                 F.col("st.stage").alias("stage"))
        .agg(
            F.sum(F.col("st.surv").cast("int")).cast("long")
            .alias("n_docs"),
            F.sum(F.when(F.col("st.surv"), F.col("n_tokens"))
                  .otherwise(F.lit(0))).cast("long").alias("n_tokens"),
        )
    )
