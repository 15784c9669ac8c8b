"""Stateful streaming exact dedup via applyInPandasWithState.

The streaming twin of pipeline.dedup_text.exact_dup_groups' keeper
choice: a continuously-ingesting pipeline admits only the first
occurrence of each content fingerprint (md5 of the case-folded,
whitespace-collapsed text — the same canonical key as
textstats.fingerprints) and suppresses every later duplicate, holding
one boolean per seen fingerprint in the state store between
micro-batches.

Scale shape: state is partitioned by fingerprint (one shuffle); its
size is O(distinct fingerprints), one boolean each — the shape a
production run bounds with state-store TTL / RocksDB state backend or
periodically compacts into the batch seen-table (operators/dedup.py's
epoch-versioned filter tables are the batch side of exactly that
handoff). No timeout is registered: a fingerprint, once seen, stays
seen for the life of the stream.

Determinism/oracle: within one micro-batch the state function sees
every row of its key and emits the min-doc_id row, so over a bounded
availableNow run that drains the source in a single batch the output
equals the batch GROUP BY (fingerprint) -> min(doc_id) — a full
DuckDB oracle. Across multiple micro-batches the FIRST batch
containing a key wins (true arrival-order streaming semantics); the
contract run is single-batch, the same bounded-run caveat class as
streaming sessionization (streaming/sessions.py docstring).
"""

from __future__ import annotations

import itertools
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ptt_spider_go_spark.streaming.source import read_table_stream

DEDUP_OUT_SCHEMA = "fingerprint string, doc_id long"
_STATE_SCHEMA = "seen boolean"


def dedup_stream(docs: DataFrame) -> DataFrame:
    """Streaming DataFrame of first-occurrence (fingerprint, doc_id)
    rows: one row per distinct canonical fingerprint, doc_id = the
    smallest id among the rows of the micro-batch that introduced it;
    later rows (same batch or later batches) are suppressed by the
    per-key seen flag."""

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (fp,) = key
        if state.exists:  # fingerprint already admitted: drain, emit nothing
            for _ in pdfs:
                pass
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        state.update((True,))
        yield pd.DataFrame(
            {"fingerprint": [fp], "doc_id": [int(rows["doc_id"].min())]}
        )

    canon = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    prepared = docs.select("doc_id", F.md5(canon).alias("fingerprint"))
    return prepared.groupBy("fingerprint").applyInPandasWithState(
        fn,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the driver's documents.parquet — layout
    dispatch (single file vs Spark-written part directory) lives in
    streaming.source.read_table_stream (ADVICE r04)."""
    return read_table_stream(spark, sf_dir, "documents")


def run_dedup_bounded(docs_stream: DataFrame, spark: SparkSession) -> DataFrame:
    """Run the streaming dedup to completion over a bounded file source
    (availableNow) and return the admitted rows as a batch DataFrame."""
    name = f"dedup_sink_{next(_SINK_SEQ)}"
    q = (
        dedup_stream(docs_stream)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    return spark.table(name)


_SINK_SEQ = itertools.count()


# ---------------------------------------------------------------------------
# Streaming LSH near-dup admission (X41)
# ---------------------------------------------------------------------------

NEAR_DUP_OUT_SCHEMA = "doc_id long, band int, is_dup boolean"
_NEAR_DUP_STATE_SCHEMA = "keeper long"


def near_dup_stream(docs: DataFrame) -> DataFrame:
    """Streaming near-duplicate FLAGGING — the continuous-ingest twin
    of the batch MinHash/LSH family (pipeline.dedup_text): each doc's
    4 minhashes are computed IN-ROW (array_min over a transform of the
    shingle array — no aggregation, so the stream stays a stateless
    projection until the one stateful op), banded exactly like the
    batch band_table (band 0 = (mh0,mh1), band 1 = (mh2,mh3)), and
    each (band, sig) bucket admits its first-seen doc as keeper in the
    state store; every row is emitted with is_dup = (doc != keeper).
    A doc flagged in ANY band is a near-dup candidate — the same
    any-band rule as lsh_candidate_pairs, evaluated online.

    Scale shape: one shuffle (groupBy band+sig for the state op);
    state is one long per OCCUPIED band bucket — strictly smaller
    than the admitted corpus, and bounded in production by the same
    TTL/compact-into-batch-filter-tables handoff as dedup_stream.

    Determinism/oracle: in a bounded single-batch run the keeper is
    min(doc_id) per bucket, so the output equals a batch
    min-over-bucket GROUP BY — full DuckDB oracle (same bounded-run
    caveat class as dedup_stream above). Across real micro-batches
    the first-arriving batch wins, true streaming semantics.
    """
    from ptt_spider_go_spark.pipeline.common import (
        md5_long,
        shingles_from_tokens,
        tokens,
    )

    toked = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    shs = toked.select(
        "doc_id", shingles_from_tokens(F.col("toks")).alias("shs"))
    def mh(i: int):
        # NB: the seed must be bound OUTSIDE the lambda — a two-param
        # lambda (sh, i) would be read by pyspark as its (element,
        # index) transform variant, silently rebinding i to the array
        # index Column.
        return F.array_min(
            F.transform(F.col("shs"), lambda sh: md5_long(sh, seed=i))
        ).alias(f"mh{i}")

    sigs = shs.select("doc_id", *[mh(i) for i in range(4)])
    banded = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("band"),
                    F.concat_ws("-", "mh0", "mh1").alias("sig"),
                ),
                F.struct(
                    F.lit(1).alias("band"),
                    F.concat_ws("-", "mh2", "mh3").alias("sig"),
                ),
            )
        ).alias("bs"),
    ).select("doc_id", F.col("bs.band").alias("band"),
             F.col("bs.sig").alias("sig"))

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState):
        rows = pd.concat(list(pdfs), ignore_index=True)
        if state.exists:
            (keeper,) = state.get
        else:
            keeper = int(rows["doc_id"].min())
            state.update((keeper,))
        yield pd.DataFrame(
            {
                "doc_id": rows["doc_id"],
                "band": key[0],
                "is_dup": rows["doc_id"] != keeper,
            }
        )

    return banded.groupBy("band", "sig").applyInPandasWithState(
        fn,
        outputStructType=NEAR_DUP_OUT_SCHEMA,
        stateStructType=_NEAR_DUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_near_dup_bounded(docs_stream: DataFrame,
                         spark: SparkSession) -> DataFrame:
    """Bounded availableNow run of the streaming near-dup flagger,
    folded to one row per doc: (doc_id, n_dup_bands, is_near_dup)."""
    name = f"near_dup_sink_{next(_SINK_SEQ)}"
    q = (
        near_dup_stream(docs_stream)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    per_row = spark.table(name)
    return per_row.groupBy("doc_id").agg(
        F.sum(F.col("is_dup").cast("int")).cast("long").alias("n_dup_bands"),
        (F.sum(F.col("is_dup").cast("int")) > 0).alias("is_near_dup"),
    )
