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
    """File-source stream over the driver's documents.parquet (schema
    from a batch footer peek, as read_events_stream does)."""
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


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
