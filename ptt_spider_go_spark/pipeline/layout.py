"""Z-order (Morton) data layout + pruning receipts (X122).

Lakehouse tables (Iceberg/Delta) skip data by consulting per-file
min/max column statistics; a file is read only when its bounding box
intersects the query's predicate box. How much gets skipped is pure
LAYOUT: an append-ordered (time-sorted) table prunes time predicates
perfectly but keeps every file's user-id range at full width, so a
2-D box (user range × time range) still scans EVERY user in the time
slice. Interleaving the bits of both dimensions — the Z-order /
Morton curve (Morton 1966; OPTIMIZE ZORDER BY in Delta, z-order sort
transforms in Iceberg) — keeps each file's bounding box tight in
BOTH dimensions, so a 2-D box touches O(selectivity) of the files.

The classic Morton pitfall (measured here before fixing it: the raw
interleave of an 11-bit user axis with a 16-bit minute axis has
constant x-high-bits, so the bucket prefix collapses to "y's top
bits" — a WORSE time layout): dimensions must occupy comparable bit
ranges before interleaving. Delta does this by range-ranking each
column; the deterministic, oracle-replayable stand-in here is min-max
scaling each dimension to the full 16-bit domain —

    x16 = floor((x − x_min) · 65535 / max(x_max − x_min, 1))

(the corpus min/max come from one partial-agg scalar probe — the
approved idiom). The scaling division is provably exact in doubles:
the numerator is an exact integer < 2^53, a non-multiple quotient
sits ≥ 1/range from any integer, and the division's rounding error
at 2^16 scale is ~7·10⁻¹², five-plus orders too small to cross; the
same proof covers the minute derivation floor((µs − epoch)/60e6)
(pipeline/kmeans.py carries the identical floor-mean argument).

Both layouts are given the SAME file count (2^BBITS = 1024) so the
receipt compares layouts, not metadata budgets:

    morton : bucket = top-BBITS bits of interleave(x16, y16)
    linear : bucket = y16 >> (16 − BBITS/2 · 2) … i.e. y16 >> 6 —
             the append/time-sorted writer at the same granularity

and per (layout, bucket) the receipt carries the min/max manifest
stats an Iceberg writer would, plus `touched` — whether the FIXED
query box (users 64–127 × minutes 10240–12287, stated in RAW units,
as manifests store raw values) intersects the bucket's bounding box.
Σ touched·n is the scan-rows comparison: the linear layout's floor
is the full time slice times ALL users (~4.7% of the corpus for this
box at sf0.1), while the Morton layout scans only the box's Z-cells
(~0.6% — the 8× receipt tests pin directionally).

Everything in the receipt is BIGINT bit arithmetic plus the two
provably-exact floor divisions — no sampling, no floats; bit
identical across engines and partitionings (repartitionByRange's
sampled bounds would not be, which is why the bucketing is an
explicit bit prefix).

Scale shape: one scalar probe (partial-agg min/max), one full-scan
projection (shift/mask intrinsics inside WholeStageCodegen), one
2^BBITS-bounded map-side-combined groupBy. The write path is the
same projection + partitionBy('bucket'); tests pin that a box filter
over the written layout lists only the touched buckets' directories.
At 100 TB: identical plan with 2^BBITS sized to the target file size.

Reference tie-in: the Go crawler writes one directory per board
(`storage.go` dir-key layout) — a 1-D layout; multi-dimensional
layout is pipeline-extension territory (SURVEY §2 X-table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: 2024-01-01T00:00:00Z in microseconds — the events epoch.
EPOCH0_US = 1_704_067_200_000_000

#: bits per dimension after min-max scaling.
BITS = 16

#: 2^BBITS buckets ("files") for BOTH layouts.
BBITS = 10

#: the fixed query box in RAW units (64 users × 2048 minutes).
BOX_X_LO, BOX_X_HI = 64, 127
BOX_Y_LO, BOX_Y_HI = 10_240, 12_287


def morton(x, y, bits: int = BITS):
    """Bit-interleave two BIGINT columns: result bit 2i is x's bit i,
    bit 2i+1 is y's bit i. Disjoint powers of two, so the interleave
    is a plain sum — the identical expression runs in any engine."""
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftright(x, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i))
        )
        terms.append(
            F.shiftright(y, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1))
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def event_dims(events: DataFrame) -> DataFrame:
    """(x, y): user_id and the minute-of-corpus axis, raw units. ts
    is TIMESTAMP_NTZ; the session tz is pinned UTC so the cast is
    exact, and floor((µs − epoch)/60e6) is provably exact in doubles
    (module docstring)."""
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    return events.select(
        F.col("user_id").alias("x"),
        F.floor((us - F.lit(EPOCH0_US)) / F.lit(60_000_000))
        .cast("long")
        .alias("y"),
    )


def _scale(col, lo: int, hi: int):
    """min-max scale a BIGINT column onto [0, 2^BITS − 1] — the
    deterministic stand-in for Delta's range-rank (exactness proof in
    the module docstring)."""
    rng = max(hi - lo, 1)
    return (
        F.floor(((col - F.lit(lo)) * F.lit((1 << BITS) - 1)) / F.lit(rng))
        .cast("long")
    )


def bucketize(events: DataFrame) -> DataFrame:
    """(layout, bucket, x, y): every event under both equal-file-count
    layouts — 'morton' (top BBITS bits of interleave(x16, y16)) and
    'linear' (top BBITS bits of y16: the time-sorted writer)."""
    dims = event_dims(events)
    b = dims.agg(
        F.min("x").alias("xlo"), F.max("x").alias("xhi"),
        F.min("y").alias("ylo"), F.max("y").alias("yhi"),
    ).collect()[0]
    x16 = _scale(F.col("x"), int(b["xlo"]), int(b["xhi"]))
    y16 = _scale(F.col("y"), int(b["ylo"]), int(b["yhi"]))
    mort = dims.select(
        F.lit("morton").alias("layout"),
        F.shiftright(morton(x16, y16), 2 * BITS - BBITS)
        .cast("long")
        .alias("bucket"),
        "x", "y",
    )
    lin = dims.select(
        F.lit("linear").alias("layout"),
        F.shiftright(y16, BITS - BBITS).cast("long").alias("bucket"),
        "x", "y",
    )
    return mort.unionByName(lin)


def zorder_receipts(events: DataFrame) -> DataFrame:
    """(layout, bucket, n, x_min, x_max, y_min, y_max, touched): the
    manifest a lakehouse writer would carry for each layout, plus
    whether the fixed RAW-unit query box intersects the bucket's
    bounding box (touched = the file would be SCANNED). All BIGINT."""
    touched = (
        (F.col("x_max") >= BOX_X_LO)
        & (F.col("x_min") <= BOX_X_HI)
        & (F.col("y_max") >= BOX_Y_LO)
        & (F.col("y_min") <= BOX_Y_HI)
    )
    return (
        bucketize(events)
        .groupBy("layout", "bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
        )
        .withColumn("touched", touched.cast("long"))
        .orderBy("layout", "bucket")
    )


def prune_summary(events: DataFrame) -> DataFrame:
    """(layout, buckets_total, buckets_touched, rows_total,
    rows_scanned): the headline skip ratio per layout. The linear
    layout's rows_scanned floor is |time slice| · |all users|; the
    Morton layout scans only the buckets whose 2-D bounding boxes
    meet the box — O(box area) instead of O(time-slice width)."""
    r = zorder_receipts(events)
    return (
        r.groupBy("layout")
        .agg(
            F.count("*").alias("buckets_total"),
            F.sum("touched").alias("buckets_touched"),
            F.sum("n").alias("rows_total"),
            F.sum(F.col("touched") * F.col("n")).alias("rows_scanned"),
        )
        .orderBy("layout")
    )
