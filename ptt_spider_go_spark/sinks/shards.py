"""Sharded training-corpus export sink.

The last stage of a 100 TB curation pipeline is materializing the
corpus as TRAINING SHARDS: fixed-token-mass files a data loader can
stripe across hosts (the webdataset / Megatron-bin / LLM-foundry
layout — N roughly-equal shards per language, each listing its token
mass in a manifest the loader samples from). Two deliverables:

- `assign_shards`: the pure assignment operator (doc -> shard_id),
  deterministic and SQL-oracle-able, usable without any filesystem.
- `write_shards`: the sink — one parquet directory per
  (lang, shard_id) partition plus a manifest table, written in one
  pass with no extra shuffle beyond the assignment's own window.

Shard assignment is FIXED TOKEN-OFFSET binning of the per-language
running token total in md5(doc_id) hash order:
shard_id = (cum_tokens - n_tokens) / shard_tokens. This is the
deliberate choice (vs pack_documents' greedy reset): shards are
storage units, not training windows — an occasional shard a few
hundred tokens over target is free, while the offset formula needs
only ONE window pass and is exactly reproducible in SQL. The hash
order doubles as a shuffle: adjacent doc_ids land in different
shards, so per-shard content is an unbiased corpus sample (loaders
that read shards sequentially still see shuffled data).

Reference parity: the reference's sink is one markdown file per
article (storage/markdown.go); sharded bulk export has no analogue
there and extends SURVEY §2's pipeline extensions (X38).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ptt_spider_go_spark.pipeline.common import tokens


def assign_shards(docs: DataFrame, shard_tokens: int = 2000) -> DataFrame:
    """(doc_id, lang, n_tokens, shard_id): deterministic per-language
    shard assignment by token-offset binning (module docstring).

    Scale shape: one narrow projection (text stays in the scan), ONE
    per-language running-sum window [the only shuffle]. Integer-exact
    end to end (token counts and offsets are BIGINTs), so the DuckDB
    oracle matches bit for bit.
    """
    proj = docs.select(
        "doc_id", "lang", F.size(tokens(F.col("text"))).alias("n_tokens")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w).cast("long")
    # Integer DIV, not floor(double /): exact past 2^53 total tokens.
    return (
        proj.withColumn("cum_off", cum - F.col("n_tokens"))
        .select(
            "doc_id", "lang", "n_tokens",
            F.expr(f"cum_off DIV {int(shard_tokens)}")
            .cast("long").alias("shard_id"),
        )
    )


def shard_manifest(assigned: DataFrame) -> DataFrame:
    """(lang, shard_id, n_docs, shard_tokens): the loader-facing
    manifest — one row per shard with its exact token mass. One
    groupBy on the (already narrow) assignment [map-side partial]."""
    return (
        assigned.groupBy("lang", "shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("shard_tokens"),
        )
    )


def write_shards(docs: DataFrame, path: str,
                 shard_tokens: int = 2000) -> DataFrame:
    """Materialize the corpus as partitioned parquet
    `path/data/lang=<l>/shard_id=<s>/` plus `path/manifest/`; returns
    the manifest DataFrame (read back from disk, so callers see
    exactly what a loader would).

    The data write carries full rows partitioned by the assignment
    join [one shuffle on doc_id]; partition pruning then gives a
    loader O(1) access to any (lang, shard) slice.
    """
    assigned = assign_shards(docs, shard_tokens=shard_tokens)
    data = docs.join(assigned.select("doc_id", "shard_id"), "doc_id")
    (
        data.repartition("lang", "shard_id")
        .write.mode("overwrite")
        .partitionBy("lang", "shard_id")
        .parquet(os.path.join(path, "data"))
    )
    shard_manifest(assigned).write.mode("overwrite").parquet(
        os.path.join(path, "manifest"))
    spark: SparkSession = docs.sparkSession
    return spark.read.parquet(os.path.join(path, "manifest"))
