"""Sessionization + Structured Streaming + embedding near-dup tests.

(Spark-vs-DuckDB value parity for these operators is additionally
enforced by the driver contract / tools/check_contract.py.)
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ptt_spider_go_spark.pipeline import sessions, similarity
from ptt_spider_go_spark.streaming import windowed_event_counts

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(eid, minutes, user, etype="view", value=1.0):
    return (eid, T0 + dt.timedelta(minutes=minutes), user, etype, value)


EVENTS_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double"
)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # user 1: two sessions split by a 45-min gap
        _ev(1, 0, 1), _ev(2, 10, 1), _ev(3, 20, 1),
        _ev(4, 65, 1), _ev(5, 70, 1),
        # user 2: one session, events exactly 30 min apart (gap == limit
        # does NOT split: the reference comparison is strict >)
        _ev(6, 0, 2), _ev(7, 30, 2), _ev(8, 60, 2),
        # user 3: single event
        _ev(9, 500, 3, "purchase", 9.5),
    ]
    return spark.createDataFrame(rows, EVENTS_SCHEMA)


def test_sessionize_gap_semantics(spark, events):
    out = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["session_start"])
        for r in sessions.sessionize(events, gap_minutes=30).collect()
    }
    assert out[(1, 1)][0] == 3
    assert out[(1, 2)][0] == 2
    assert out[(1, 2)][1] == T0 + dt.timedelta(minutes=65)
    assert out[(2, 1)][0] == 3          # 30-min gaps stay one session
    assert out[(3, 1)][0] == 1
    assert len(out) == 4


def test_sessionize_total_value_order_independent(spark, events):
    df = sessions.sessionize(events, gap_minutes=30)
    shuffled = sessions.sessionize(events.repartition(7), gap_minutes=30)
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, shuffled.collect()))


def test_windowed_counts_batch(spark, events):
    out = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in windowed_event_counts(events).collect()
    }
    assert out[(T0, "view")] == 5        # minutes 0,10,20,0,30
    assert out[(T0 + dt.timedelta(hours=1), "view")] == 3   # minutes 60,65,70
    assert out[(T0 + dt.timedelta(hours=8), "purchase")] == 1


def test_windowed_counts_stream_matches_batch(spark, events, tmp_path):
    """Streaming availableNow over a file source == the batch GROUP BY."""
    src = str(tmp_path / "events_stream")
    events.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    agg = windowed_event_counts(stream)
    assert agg.isStreaming

    from ptt_spider_go_spark.streaming import run_bounded

    got = sorted(map(tuple, run_bounded(agg, spark).collect()))
    want = sorted(map(tuple, windowed_event_counts(events).collect()))
    assert got == want


def test_stateful_stream_sessionize_matches_batch(spark, events, tmp_path):
    """applyInPandasWithState sessionizer == batch sessionize.

    A far-future sentinel event per user closes every real session via
    the normal gap path (availableNow ends the stream before event-time
    timeouts fire for still-open sessions); sentinel sessions are then
    dropped from the comparison.
    """
    sentinel_ts = T0 + dt.timedelta(days=30)
    users = [r["user_id"] for r in events.select("user_id").distinct().collect()]
    sentinels = spark.createDataFrame(
        [(10_000 + u, sentinel_ts, u, "sentinel", 0.0) for u in users],
        EVENTS_SCHEMA,
    )
    src = str(tmp_path / "sess_stream")
    events.unionByName(sentinels).write.mode("overwrite").parquet(src)

    from ptt_spider_go_spark.streaming.sessions import run_sessionize_bounded

    stream = spark.readStream.schema(events.schema).parquet(src)
    got = {
        (r["user_id"], r["session_start"]): (r["n_events"], round(r["total_value"], 6))
        for r in run_sessionize_bounded(stream, spark, gap_minutes=30).collect()
        if r["session_start"] != sentinel_ts  # drop sentinel sessions
    }
    want = {
        (r["user_id"], r["session_start"]): (r["n_events"], round(r["total_value"], 6))
        for r in sessions.sessionize(events, gap_minutes=30).collect()
    }
    assert got == want


def test_stateful_stream_sessionize_across_microbatches(spark, events, tmp_path):
    """State must carry open sessions ACROSS micro-batches: split the
    input into per-hour files and force maxFilesPerTrigger=1, so user
    1's first session (events at minutes 0-20) is still open when the
    second batch delivers minute-65 events. Result must equal the
    single-batch run."""
    import itertools

    sentinel_ts = T0 + dt.timedelta(days=30)
    users = [r["user_id"] for r in events.select("user_id").distinct().collect()]
    sentinels = spark.createDataFrame(
        [(10_000 + u, sentinel_ts, u, "sentinel", 0.0) for u in users],
        EVENTS_SCHEMA,
    )
    full = events.unionByName(sentinels)
    src = str(tmp_path / "sess_stream_mb")
    # One file per event-hour bucket, named in time order so the file
    # source (which processes files oldest-first by default here via
    # latestFirst=false) feeds batches chronologically.
    import os

    os.makedirs(src, exist_ok=True)
    buckets = sorted({r["ts"].replace(minute=0, second=0, microsecond=0)
                      for r in full.select("ts").collect()})
    for i, b in enumerate(buckets):
        part = full.filter(
            (F.col("ts") >= b) & (F.col("ts") < b + F.expr("INTERVAL 1 HOUR"))
        )
        part.coalesce(1).write.mode("overwrite").parquet(f"{src}/b{i:03d}")
    from ptt_spider_go_spark.streaming.sessions import sessionize_stream

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    name = f"mb_sink_{next(itertools.count())}_x"
    q = (
        sessionize_stream(stream, gap_minutes=30)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in spark.table(name).collect()
        if r["session_start"] != sentinel_ts
    }
    want = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in sessions.sessionize(events, gap_minutes=30).collect()
    }
    assert got == want
    assert len(q.recentProgress) > 1  # really ran as multiple micro-batches


def test_embedding_near_dup_pairs(spark):
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0], 0),
            (2, [0.999, 0.01, 0.0], 0),   # near-dup of 1 (same bucket)
            (3, [0.0, 1.0, 0.0], 0),      # orthogonal to 1
            (4, [1.0, 0.0, 0.0], 1),      # identical to 1 but other bucket
        ],
        "vec_id long, embedding array<float>, label int",
    )
    pairs = {
        (r["vec_a"], r["vec_b"]): r["score"]
        for r in similarity.near_dup_pairs(emb, threshold=0.9).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.99
    assert (1, 3) not in pairs           # below threshold
    assert (1, 4) not in pairs           # bucket-limited candidate set


def test_stream_dedup_first_occurrence(spark, tmp_path):
    """Streaming exact dedup over a bounded file source: one admitted
    row per canonical fingerprint with the min doc_id; case/whitespace
    variants collapse to one key (canonical-form parity with
    textstats.fingerprints)."""
    from ptt_spider_go_spark.streaming import run_dedup_bounded

    rows = [
        (0, "Hello   World"),
        (1, "hello world"),        # canonical dup of 0
        (2, "something else"),
        (3, "  HELLO WORLD  "),    # canonical dup of 0
        (4, "something else"),     # exact dup of 2
    ]
    src = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1) \
        .write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    got = {r["doc_id"] for r in run_dedup_bounded(stream, spark).collect()}
    assert got == {0, 2}


def test_stream_source_both_parquet_layouts(spark, tmp_path):
    """read_documents_stream must read the SAME rows whether
    documents.parquet is a single file or a Spark-written part-file
    directory (ADVICE r04: the old unconditional pathGlobFilter matched
    zero files in the directory layout and streamed zero rows)."""
    import shutil

    from ptt_spider_go_spark.streaming import (
        read_documents_stream,
        run_dedup_bounded,
    )

    rows = [(0, "alpha beta"), (1, "gamma delta"), (2, "alpha beta")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    # directory layout: sf_dir/documents.parquet/part-*.parquet
    dir_sf = tmp_path / "dir_layout"
    df.repartition(2).write.parquet(str(dir_sf / "documents.parquet"))

    # single-file layout: sf_dir/documents.parquet (one leaf file)
    file_sf = tmp_path / "file_layout"
    staging = tmp_path / "staging"
    df.coalesce(1).write.parquet(str(staging))
    file_sf.mkdir()
    part = next(staging.glob("part-*.parquet"))
    shutil.copy(part, file_sf / "documents.parquet")

    want = {0, 1}  # doc 2 is an exact dup of 0
    for sf in (dir_sf, file_sf):
        stream = read_documents_stream(spark, str(sf))
        got = {r["doc_id"]
               for r in run_dedup_bounded(stream, spark).collect()}
        assert got == want, (str(sf), got)


def test_stream_near_dup_any_band_rule(spark, tmp_path):
    """Streaming LSH near-dup flagging: exact dups collide in BOTH
    bands (keeper = min doc_id, flagged twice); a distinct doc is
    clean; the fold reports n_dup_bands per doc."""
    from ptt_spider_go_spark.streaming import run_near_dup_bounded

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (0, base),
        (1, base),                               # exact dup -> both bands
        (2, "completely different words entirely here now today ok"),
        (3, base),                               # another dup of 0
    ]
    src = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1) \
        .write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    got = {r["doc_id"]: r for r in
           run_near_dup_bounded(stream, spark).collect()}
    assert got[0]["n_dup_bands"] == 0 and not got[0]["is_near_dup"]
    assert got[1]["n_dup_bands"] == 2 and got[1]["is_near_dup"]
    assert got[3]["n_dup_bands"] == 2 and got[3]["is_near_dup"]
    assert got[2]["n_dup_bands"] == 0 and not got[2]["is_near_dup"]


def test_stream_near_dup_matches_batch_bands(spark, tmp_path):
    """The stream's in-row signatures equal the batch explode+groupBy
    minhash signatures: a doc is flagged iff lsh_candidate_pairs
    pairs it with a smaller doc_id."""
    from ptt_spider_go_spark.pipeline import dedup_text
    from ptt_spider_go_spark.streaming import run_near_dup_bounded

    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "completely different words entirely here now"),
        (4, ""),
        (5, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    src = str(tmp_path / "docs")
    docs.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    got = {r["doc_id"]: r["is_near_dup"]
           for r in run_near_dup_bounded(stream, spark).collect()}
    pairs = dedup_text.lsh_candidate_pairs(
        dedup_text.minhash_signatures(docs)).collect()
    flagged_by_batch = {p["doc_b"] for p in pairs}
    assert got == {d: (d in flagged_by_batch) for d, _t in rows}
