"""X122: Z-order/Morton layout + pruning receipts (pipeline/layout.py).

Pins: the interleave matches a pure-Python bit mirror; the min-max
scaling is the exact rational floor (checked against Fraction
arithmetic across a full small domain, including the degenerate
one-value dimension); bucketing is partitioning-invariant; `touched`
is sound — reading ONLY the touched buckets of a physically written
partitionBy('bucket') layout returns exactly the box query's rows
(the lossless-skip property file skipping rests on); and the Morton
layout never scans more rows than the append layout for the 2-D box
while both layouts carry identical totals.
"""

from __future__ import annotations

import datetime as dt
from fractions import Fraction

from pyspark.sql import functions as F

from ptt_spider_go_spark.pipeline.layout import (
    BITS,
    BOX_X_HI,
    BOX_X_LO,
    BOX_Y_HI,
    BOX_Y_LO,
    EPOCH0_US,
    bucketize,
    morton,
    prune_summary,
    zorder_receipts,
)

_T0 = dt.datetime(2024, 1, 1)


def _events(spark, rows, parts=4):
    """rows: (event_id, user_id, minute) → a synthetic events slice."""
    data = [
        (eid, _T0 + dt.timedelta(minutes=m), uid, "view", 1.0, "{}")
        for eid, uid, m in rows
    ]
    return spark.createDataFrame(
        data,
        schema="event_id long, ts timestamp, user_id long, "
               "event_type string, value double, props string",
    ).repartition(parts)


def _py_morton(x: int, y: int, bits: int = BITS) -> int:
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_morton_matches_bit_mirror(spark):
    pts = [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535),
           (43210, 1499), (12345, 54321)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = [
        r["m"]
        for r in df.select(morton(F.col("x"), F.col("y")).alias("m"))
        .orderBy("x", "y").collect()
    ]
    want = [_py_morton(x, y) for x, y in sorted(pts)]
    assert got == want


def test_scale_is_exact_rational_floor(spark):
    # every user 0..149 against the exact Fraction floor — the double
    # division must never cross an integer boundary.
    rows = [(i, i % 150, i % 43200) for i in range(600)]
    df = _events(spark, rows)
    got = {
        (r["layout"], r["x"], r["y"]): r["bucket"]
        for r in bucketize(df).collect()
    }
    xs = sorted({u for _, u, _ in rows})
    ys = sorted({m for _, _, m in rows})
    xlo, xr = xs[0], max(xs[-1] - xs[0], 1)
    ylo, yr = ys[0], max(ys[-1] - ys[0], 1)
    for _, u, m in rows:
        x16 = int(Fraction((u - xlo) * 65535, xr).__floor__())
        y16 = int(Fraction((m - ylo) * 65535, yr).__floor__())
        assert got[("morton", u, m)] == _py_morton(x16, y16) >> 22
        assert got[("linear", u, m)] == y16 >> 6


def test_degenerate_single_value_dimension(spark):
    rows = [(i, 7, 100 + i) for i in range(5)]  # one user only
    out = bucketize(_events(spark, rows, parts=2)).collect()
    # x range is 0 → x16 = 0 everywhere; no division blowup.
    assert all(r["bucket"] >= 0 for r in out)
    morton_buckets = {r["bucket"] for r in out if r["layout"] == "morton"}
    assert len(morton_buckets) >= 1


def test_bucketize_partitioning_invariant(spark):
    rows = [(i, (i * 13) % 300, (i * 377) % 43200) for i in range(400)]
    a = sorted(map(tuple, bucketize(_events(spark, rows, parts=1)).collect()))
    b = sorted(map(tuple, bucketize(_events(spark, rows, parts=7)).collect()))
    assert a == b


def test_touched_skip_is_lossless_on_written_layout(spark, tmp_path):
    # spread events across the box and far outside it
    rows = [(i, (i * 7) % 300, (i * 139) % 43200) for i in range(2000)]
    df = _events(spark, rows)
    rec = zorder_receipts(df).filter(F.col("layout") == "morton")
    touched = [r["bucket"] for r in rec.collect() if r["touched"] == 1]
    assert 0 < len(touched) < 1024
    # physically write the morton layout, one directory per bucket
    path = str(tmp_path / "morton")
    (
        bucketize(df).filter(F.col("layout") == "morton")
        .select("bucket", "x", "y")
        .write.partitionBy("bucket").parquet(path)
    )
    box = (
        F.col("x").between(BOX_X_LO, BOX_X_HI)
        & F.col("y").between(BOX_Y_LO, BOX_Y_HI)
    )
    full = spark.read.parquet(path).filter(box)
    pruned = spark.read.option("basePath", path).parquet(
        *[f"{path}/bucket={b}" for b in touched]
    ).filter(box)
    want = sorted((r["x"], r["y"]) for r in full.collect())
    got = sorted((r["x"], r["y"]) for r in pruned.collect())
    assert want and got == want


def test_morton_scans_no_more_than_linear(spark):
    rows = [(i, (i * 11) % 280, (i * 401) % 43200) for i in range(3000)]
    s = {
        r["layout"]: (r["buckets_total"], r["rows_total"],
                      r["rows_scanned"])
        for r in prune_summary(_events(spark, rows)).collect()
    }
    assert s["morton"][0] == s["linear"][0] == 1024
    assert s["morton"][1] == s["linear"][1] == 3000
    assert s["morton"][2] <= s["linear"][2]


def test_event_dims_minute_derivation(spark):
    rows = [(0, 1, 0), (1, 2, 43199)]
    df = _events(spark, rows, parts=1)
    from ptt_spider_go_spark.pipeline.layout import event_dims

    got = sorted((r["x"], r["y"]) for r in event_dims(df).collect())
    assert got == [(1, 0), (2, 43199)]
    assert EPOCH0_US == int(_T0.replace(
        tzinfo=dt.timezone.utc).timestamp()) * 1_000_000
