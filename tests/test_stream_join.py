"""X146: stream-stream interval join (streaming/joins.py).

Pins: on a hand fixture the attribution pairs are exactly the batch
interval join (boundary rows at exactly −24h and exactly 0 included;
one second beyond excluded; cross-user never joins); multiple views
attribute to one purchase and one view to multiple purchases (the
join is many-to-many by design); a pure-batch mirror matches the
streaming result row-for-row on a larger generated fixture.
"""

from __future__ import annotations

import datetime as dt
from datetime import datetime

from ptt_spider_go_spark.streaming.joins import stream_view_purchase_join

SCHEMA = ("event_id long, ts timestamp_ntz, user_id long, "
          "event_type string")


def _stream_of(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, schema=SCHEMA)
    p = str(tmp_path / "events")
    df.coalesce(1).write.mode("overwrite").parquet(p)
    return spark.readStream.schema(df.schema).parquet(p)


def _run(spark, tmp_path, rows):
    out = stream_view_purchase_join(
        spark, _stream_of(spark, tmp_path, rows))
    return sorted(
        (r["purchase_id"], r["view_id"], r["user_id"])
        for r in out.collect()
    )


def _mirror(rows):
    views = [r for r in rows if r[3] == "view"]
    purchases = [r for r in rows if r[3] == "purchase"]
    out = []
    for pid, pts, pu, _t in purchases:
        for vid, vts, vu, _t2 in views:
            if vu == pu and pts - dt.timedelta(hours=24) <= vts <= pts:
                out.append((pid, vid, pu))
    return sorted(out)


def _ts(h, mi=0, s=0, day=2):
    return datetime(2024, 1, day, h, mi, s)


def test_boundaries_and_users(spark, tmp_path):
    rows = [
        (1, _ts(12), 7, "purchase"),
        (10, _ts(12, day=1), 7, "view"),          # exactly -24h: in
        (11, _ts(11, 59, 59, day=1), 7, "view"),  # 1s beyond: out
        (12, _ts(12), 7, "view"),                 # exactly 0: in
        (13, _ts(12, 0, 1), 7, "view"),           # after purchase: out
        (14, _ts(11), 8, "view"),                 # other user: out
        (15, _ts(11), 7, "click"),                # wrong type: out
    ]
    got = _run(spark, tmp_path, rows)
    assert got == _mirror(rows)
    assert got == [(1, 10, 7), (1, 12, 7)]


def test_many_to_many(spark, tmp_path):
    rows = [
        (1, _ts(10), 5, "purchase"),
        (2, _ts(12), 5, "purchase"),
        (20, _ts(9), 5, "view"),
        (21, _ts(9, 30), 5, "view"),
    ]
    got = _run(spark, tmp_path, rows)
    assert got == [(1, 20, 5), (1, 21, 5), (2, 20, 5), (2, 21, 5)]


def test_matches_batch_mirror_generated(spark, tmp_path):
    rows = []
    for i in range(240):
        rows.append((
            i,
            datetime(2024, 1, 1) + dt.timedelta(minutes=(i * 97) % 4320),
            i % 7,
            ["view", "purchase", "click"][i % 3],
        ))
    got = _run(spark, tmp_path, rows)
    assert got == _mirror(rows)
    assert len(got) > 10
