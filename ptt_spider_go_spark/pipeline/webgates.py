"""Crawl-quality gate funnel: the page-survival report for the
web-facing half of the pipeline.

corpus_funnel (X43, pipeline/curation.py) publishes the survival
table for the TEXT-quality gates (Gopher/C4/dedup/decontamination/
classifier). This is its twin for the CRAWL-quality gates that run
before any text model ever scores a page — the order every
production crawl applies, cost-ascending, each stage paying only for
the previous stages' survivors:

  1 raw         every fetched page
  2 indexable   page-level robots meta allows indexing (X84 — the
                page's OWN opt-out, cheapest possible projection)
  3 host_ok     the host survives the keep/review/drop quality gate
                (X82 — verdict != 'drop'; host evidence is computed
                over the FULL fetch, not the gated survivors: a
                host's soft-404 rate is a property of the host,
                and gating its inputs would let a noindex-heavy
                broken host launder its verdict)
  4 unmirrored  the host is not the dropped side of a detected
                mirror pair (X83 — the lexically-greater host of
                each confirmed pair is dropped, a deterministic
                stand-in for the real policy knob of keeping the
                more authoritative host)
  5 retained    the page survives the takedown delete-list (X87 —
                last because legal state changes independently of
                content and must always be re-applied)

Scale shape: each gate is its own already-audited plan (a
projection, one host rollup, the capped mirror join, broadcast rule
joins) joined back on url or host; the funnel itself adds ONE
explode (5 stage rows per page, a boolean + one int each) and ONE
tiny groupBy(stage) — corpus_funnel's exact shape. Page text crosses
none of the funnel's own shuffles (it is reduced to length + md5 in
the gate scans).

Reference parity: no analogue (extension X89); the DuckDB oracle
nests the component oracles, so the funnel is certified by
composition, like X43.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ptt_spider_go_spark.functions.columns import url_host
from ptt_spider_go_spark.htmlparse.metarobots import robots_meta
from ptt_spider_go_spark.operators.hostquality import host_quality_panel
from ptt_spider_go_spark.operators.mirrors import (
    HOT_HASH_CAP, MIRROR_CONTAINMENT_PPM, mirror_pairs,
)
from ptt_spider_go_spark.pipeline.retention import takedown_verdicts

STAGES = ["raw", "indexable", "host_ok", "unmirrored", "retained"]


def crawl_gate_funnel(pages: DataFrame, rules: DataFrame,
                      hot_hash_cap: int = HOT_HASH_CAP,
                      containment_ppm: int = MIRROR_CONTAINMENT_PPM,
                      ) -> DataFrame:
    """(stage_id, stage, n_pages, n_chars): cumulative survivors and
    their exact character mass after each crawl-quality gate.
    `pages` needs (url, status, text, html); `rules` is the takedown
    list (kind, key)."""
    meta = robots_meta(pages.select("url", "html")) \
        .select("url", "noindex")
    panel = host_quality_panel(pages.select("url", "status", "text")) \
        .select("host", (F.col("verdict") != "drop").alias("host_keep"))
    dropped_hosts = (
        mirror_pairs(pages.select("url", "text"),
                     hot_hash_cap=hot_hash_cap,
                     containment_ppm=containment_ppm)
        .filter(F.col("is_mirror"))
        .select(F.col("host_b").alias("host"))
        .distinct()
        .withColumn("_mirror_dropped", F.lit(True))
    )
    verd = takedown_verdicts(pages.select("url", "text"), rules) \
        .select("url", "deleted")

    flags = (
        pages.select(
            "url", url_host(F.col("url")).alias("host"),
            F.length("text").cast("bigint").alias("n_chars"))
        .join(meta, "url")
        .join(F.broadcast(panel), "host")
        .join(F.broadcast(dropped_hosts), "host", "left")
        .join(verd, "url")
    )
    c2 = ~F.col("noindex")
    c3 = c2 & F.col("host_keep")
    c4 = c3 & F.coalesce(~F.col("_mirror_dropped"), F.lit(True))
    c5 = c4 & ~F.col("deleted")
    survs = [F.lit(True), c2, c3, c4, c5]
    stage_rows = F.explode(F.array(*[
        F.struct(
            F.lit(i + 1).alias("stage_id"),
            F.lit(name).alias("stage"),
            surv.alias("surv"),
        )
        for i, (name, surv) in enumerate(zip(STAGES, survs))
    ])).alias("st")
    # every page emits every stage row (surv as data, not a filter)
    # so a gate that kills everything still reports a 0 row
    return (
        flags.select("n_chars", stage_rows)
        .groupBy(F.col("st.stage_id").alias("stage_id"),
                 F.col("st.stage").alias("stage"))
        .agg(
            F.sum(F.col("st.surv").cast("bigint")).alias("n_pages"),
            F.sum(F.when(F.col("st.surv"), F.col("n_chars"))
                  .otherwise(0)).alias("n_chars"),
        )
    )
