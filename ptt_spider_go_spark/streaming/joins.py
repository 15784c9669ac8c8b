"""Stream-stream interval join: view→purchase attribution (X146).

The one Structured Streaming surface the X12–X14/X34/X41/X142 family
does not yet exercise: joining TWO streams on a key plus an
event-time RANGE — the attribution join every event pipeline runs
(which views preceded this purchase within the window?), and the
shape Spark executes with symmetric per-side state stores whose
retention is bounded by the watermark + the time-range condition
(each side buffers only `delay + window` of events per key — the
state-bound that makes the join feasible on unbounded streams; an
unconstrained stream-stream join is rejected by the planner for
exactly this reason).

Semantics: purchases ⋈ views on user_id with
view_ts ∈ [purchase_ts − ATTR_WINDOW, purchase_ts], both sides
watermarked DELAY. Run bounded (availableNow over the events
parquet, one microbatch — so no cross-batch watermark drops by the
X142 lag rule) the result is EXACTLY the batch interval join, which
is what lets the DuckDB oracle certify the streaming plan
bit-for-bit; unbounded, the identical code runs with the state
bound above.

Reference tie-in: the Go crawler's progress channel has no
cross-event correlation (types/progress.go); event attribution is
pipeline-extension territory (SURVEY §2 X-table).
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession, functions as F

#: attribution look-back window
ATTR_WINDOW = "24 hours"
#: watermark delay on both sides
DELAY = "2 hours"

_SEQ = itertools.count()


def stream_view_purchase_join(spark: SparkSession,
                              events_stream: DataFrame) -> DataFrame:
    """(purchase_id, view_id, user_id): every (purchase, preceding
    view within ATTR_WINDOW, same user) pair from the bounded
    stream-stream interval join. Ordered (purchase_id, view_id)."""
    ev = events_stream.withColumn("_ts", F.col("ts").cast("timestamp"))
    views = (
        ev.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("_ts").alias("view_ts"),
        )
        .withWatermark("view_ts", DELAY)
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("user_id"),
            F.col("_ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", DELAY)
    )
    joined = purchases.join(
        views,
        F.expr(
            "user_id = v_user"
            " AND view_ts >= purchase_ts - INTERVAL 24 HOURS"
            " AND view_ts <= purchase_ts"
        ),
    ).select("purchase_id", "view_id", "user_id")
    name = f"stream_join_{next(_SEQ)}"
    q = (
        joined.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    return spark.table(name).orderBy("purchase_id", "view_id")
