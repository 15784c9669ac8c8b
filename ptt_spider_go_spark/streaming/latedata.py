"""Watermark late-data audit: append-mode drop semantics (X142).

X12–X14/X34/X41 use watermarks to BOUND STATE; this module pins what
the watermark actually DOES to data: in append mode a window emits
exactly once — when the eviction watermark passes its end — and a
row arriving after its window was finalized is DROPPED. That loss is
the streaming-correctness contract every production pipeline must
account for up front (count what the watermark cost you, don't
discover it missing in an audit).

Deterministic harness: the events table splits by a fixed rule into
THREE parquet files streamed in order with maxFilesPerTrigger=1 +
availableNow — three microbatches: A (event_id % 5 == 1)
establishes the watermark, M (% 5 == 4) advances a batch so
eviction runs, B (the rest) arrives last and its genuinely-late
rows hit already-finalized windows. Three batches are REQUIRED to
observe a drop: rows merge into state before the same batch's
eviction, so a two-batch replay loses nothing (measured; pinned in
tests).

Replay rule (Spark's dual watermark, SPARK-24634 — calibrated
against observed `numRowsDroppedByWatermark` and pinned by a hand
fixture whose rows land exactly on the boundaries):

    wm_k    = max(event time over batches 0..k) − delay
    batch k input row KEPT  iff window_end > wm_{k-2}
      (the LATE watermark — one batch behind eviction; batches 0
       and 1 therefore never drop)
    window EMITTED          iff window_end <= wm_{K-1}
      (the final batch's EVICTION watermark; later windows stay
       open and unemitted at availableNow termination)

A kept row can never belong to a window evicted in an EARLIER batch
(wm_{j-1} <= wm_{k-2} for j < k), so emitted counts are exactly the
kept-row counts — which is what makes the DuckDB oracle able to
replay the entire stream bit-exactly.

Scale shape: the aggregation is the X13 streaming state-store
hash-agg — state bounded by |open windows| × |event types|; the
audit adds nothing. The file juggling is bounded-test plumbing (the
same query runs unbounded on a directory/Kafka source).

Reference tie-in: the Go crawler's progress channel is fire-and-
forget (types/progress.go:8-26) — delivery accounting is
pipeline-extension territory (SURVEY §2 X-table).
"""

from __future__ import annotations

import glob
import itertools
import os
import shutil
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

#: allowed lateness (the watermark delay)
DELAY = "2 hours"
#: tumbling window width
WINDOW = "1 hour"
#: batch split residues of event_id % 5: A establishes the
#: watermark, M advances it a batch, B arrives late.
BATCH_A_RESIDUE = 1
BATCH_M_RESIDUE = 4

_SEQ = itertools.count()


def _write_one_file(df: DataFrame, tmp: str, name: str) -> None:
    stage = os.path.join(tmp, f"_stage_{name}")
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
    shutil.move(part, os.path.join(tmp, name))
    shutil.rmtree(stage)


def late_data_audit(spark: SparkSession, events: DataFrame) -> DataFrame:
    """(window_start, event_type, n): the append-mode output of the
    watermarked windowed count over the three-microbatch replay —
    finalized windows only, late-beyond-watermark rows dropped per
    the module rule. Ordered (window_start, event_type)."""
    tmp = tempfile.mkdtemp(prefix="latedata_", dir="/tmp")
    try:
        src = events.select("event_id", "ts", "event_type")
        r = F.col("event_id") % 5
        _write_one_file(src.filter(r == BATCH_A_RESIDUE), tmp,
                        "00000-a.parquet")
        time.sleep(1.05)  # distinct mtimes pin the file order
        _write_one_file(src.filter(r == BATCH_M_RESIDUE), tmp,
                        "00001-m.parquet")
        time.sleep(1.05)
        _write_one_file(
            src.filter(~r.isin(BATCH_A_RESIDUE, BATCH_M_RESIDUE)),
            tmp, "00002-b.parquet",
        )
        stream = (
            spark.readStream.schema(src.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(tmp)
        )
        agg = (
            stream.withColumn("_ts", F.col("ts").cast("timestamp"))
            .withWatermark("_ts", DELAY)
            .groupBy(F.window("_ts", WINDOW).alias("w"), "event_type")
            .agg(F.count("*").alias("n"))
            .select(
                F.col("w.start").cast("timestamp_ntz")
                .alias("window_start"),
                "event_type", "n",
            )
        )
        name = f"late_audit_{next(_SEQ)}_{os.getpid()}"
        q = (
            agg.writeStream.format("memory").queryName(name)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination()
        # the memory sink holds appended rows in memory — safe to
        # drop the temp files in the finally
        return spark.table(name).orderBy("window_start", "event_type")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
