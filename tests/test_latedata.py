"""X142: watermark late-data audit (streaming/latedata.py).

Pins the dual-watermark semantics the module documents, on a hand
fixture whose rows land exactly on the decision boundaries: the
batch-after-next late filter (batches 0 and 1 never drop, even rows
far below the current eviction watermark), the drop of a
late-beyond-watermark row in batch 2, the exactly-once emission of
finalized windows with merged same-batch late rows, the withholding
of still-open windows at availableNow termination, and the
pure-Python replay of the whole rule matching Spark row-for-row on
a bigger fixture.
"""

from __future__ import annotations

from datetime import datetime

from ptt_spider_go_spark.streaming.latedata import (
    BATCH_A_RESIDUE,
    BATCH_M_RESIDUE,
    late_data_audit,
)

SCHEMA = "event_id long, ts timestamp_ntz, event_type string"


def _df(spark, rows):
    return spark.createDataFrame(list(rows), schema=SCHEMA)


def _mk(eid, h, mi, t):
    return (eid, datetime(2024, 1, 1, h, mi), t)


def _replay(rows, delay_h=2):
    """Pure-Python mirror of the module's documented rule."""
    a = [r for r in rows if r[0] % 5 == BATCH_A_RESIDUE]
    m = [r for r in rows if r[0] % 5 == BATCH_M_RESIDUE]
    b = [r for r in rows
         if r[0] % 5 not in (BATCH_A_RESIDUE, BATCH_M_RESIDUE)]

    def hour(ts):
        return ts.replace(minute=0, second=0, microsecond=0)

    def wend(ts):
        return hour(ts).replace(hour=hour(ts).hour) \
            .__add__(__import__("datetime").timedelta(hours=1))

    import datetime as dt
    wm0 = max(r[1] for r in a) - dt.timedelta(hours=delay_h)
    wm1 = max(r[1] for r in a + m) - dt.timedelta(hours=delay_h)
    kept = list(a) + list(m) + [
        r for r in b if hour(r[1]) + dt.timedelta(hours=1) > wm0
    ]
    agg: dict[tuple, int] = {}
    for _eid, ts, t in kept:
        if hour(ts) + dt.timedelta(hours=1) <= wm1:
            agg[(hour(ts), t)] = agg.get((hour(ts), t), 0) + 1
    return sorted((str(w), t, n) for (w, t), n in agg.items())


def _collect(spark, rows):
    out = late_data_audit(spark, _df(spark, rows))
    return sorted(
        (str(r["window_start"]), r["event_type"], r["n"])
        for r in out.collect()
    )


def test_boundary_semantics(spark):
    rows = [
        # batch A (ids % 5 == 1): max ts 22:00 -> wm0 = 20:00
        _mk(1, 22, 0, "x"), _mk(6, 10, 0, "x"),
        # batch M (ids % 5 == 4): 05:00 is far below the CURRENT
        # eviction watermark yet NOT dropped (late filter is a batch
        # behind); 23:30 advances wm1 to 21:30
        _mk(4, 5, 0, "late_m"), _mk(9, 23, 30, "anchor_m"),
        # batch B (the rest): 06:00 dropped (end 07:00 <= wm0=20:00),
        # 20:15 kept AND emitted (end 21:00 in (wm0, wm1]),
        # 23:00 kept but withheld (window still open)
        _mk(0, 6, 0, "late_b"), _mk(2, 20, 15, "mid_b"),
        _mk(3, 23, 0, "fresh_b"),
    ]
    got = _collect(spark, rows)
    assert got == _replay(rows)
    emitted_types = {t for _w, t, _n in got}
    assert "late_m" in emitted_types      # batch-1 never drops
    assert "mid_b" in emitted_types       # within watermark: counted
    assert "late_b" not in emitted_types  # dropped by the late filter
    assert "anchor_m" not in emitted_types  # window still open
    assert "fresh_b" not in emitted_types
    assert ("2024-01-01 10:00:00", "x", 1) in got
    # A's own 22:00 window (end 23:00 > wm1=21:30) is withheld
    assert not any(w == "2024-01-01 22:00:00" for w, _t, _n in got)


def test_exact_watermark_boundary_window_emits(spark):
    # wm1 = 23:00 - 2h = 21:00; the 20:00-21:00 window end == wm1
    # -> <= admits it (the calibrated orientation)
    rows = [
        _mk(1, 20, 30, "edge"),   # batch A; wm0 = 18:30
        _mk(4, 23, 0, "anchor"),  # batch M; wm1 = 21:00
        _mk(0, 19, 0, "b_mid"),   # end 20:00 > wm0: kept; <= wm1: out
    ]
    got = _collect(spark, rows)
    assert got == _replay(rows)
    assert ("2024-01-01 20:00:00", "edge", 1) in got
    assert ("2024-01-01 19:00:00", "b_mid", 1) in got


def test_replay_matches_on_larger_fixture(spark):
    import datetime as dt
    rows = []
    for i in range(120):
        ts = datetime(2024, 1, 1, 0, 0) + dt.timedelta(
            minutes=(i * 37) % (24 * 60))
        rows.append((i, ts, f"t{i % 3}"))
    got = sorted(
        (str(r["window_start"]), r["event_type"], r["n"])
        for r in late_data_audit(spark, spark.createDataFrame(
            rows, schema=SCHEMA)).collect()
    )
    assert got == _replay(rows)
