"""CDX capture-index generation over archive records (X91).

A WARC corpus is unusable for lookup without its index: the CDX file
(Common Crawl's cdx-*.gz, wayback's index shards) maps a SURT key +
14-digit timestamp to the exact (filename, offset, length) byte span
holding the capture. The reference has nothing like it (single-host,
in-memory seen map); at 10^10 URLs the index IS the random-access
layer over the archive.

Two builders, one render:

- `cdx_records`: over rows that already carry their true byte span —
  what sources.warc.read_warc(with_offsets=True) emits straight from
  its framing walk. Pure projection: surt key, ts14, md5 digest —
  zero shuffles.
- `cdx_from_positions`: over rows that carry only (filename,
  position, payload) — offsets reconstructed as the running sum of
  payload octet lengths per file (one window, partitioned by
  filename: bounded by shard size, never global).
- `cdx_lines`: the classic space-separated 9-field CDX line
  (` N b a m s k S V g` order), one string column ready for
  write.text — the same zero-shuffle text-sink shape as
  sinks/markdown.py.

Digest is md5 (hex) rather than Common Crawl's sha1-base32 so the
DuckDB oracle can reproduce it bit-exactly; the field contract is
identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ptt_spider_go_spark.functions.surt import surt_key

CDX_COLS = [
    "surt", "ts14", "url", "mime", "status", "digest",
    "length", "offset", "filename",
]


def _ts14(records: DataFrame):
    ts = (
        F.col("warc_ts")
        if "warc_ts" in records.columns
        else F.to_timestamp(F.col("warc_date"))
    )
    return F.date_format(ts, "yyyyMMddHHmmss")


def cdx_records(records: DataFrame) -> DataFrame:
    """(url, warc_ts|warc_date, mime, status, payload, filename,
    offset, record_len) -> CDX rows. The span columns come from the
    WARC parser's framing walk, so `offset/length` slice the shard to
    the standalone record (pinned by the byte-slice test)."""
    return records.select(
        surt_key(F.col("url")).alias("surt"),
        _ts14(records).alias("ts14"),
        "url",
        "mime",
        F.col("status").cast("int").alias("status"),
        F.md5(F.col("payload")).alias("digest"),
        F.col("record_len").cast("long").alias("length"),
        F.col("offset").cast("long").alias("offset"),
        "filename",
    )


def cdx_from_positions(records: DataFrame) -> DataFrame:
    """Same output contract, offsets derived: records laid out
    back-to-back per file in `position` order, length = payload
    octets. One window partitioned by filename — per-shard state only,
    the 100 TB-safe shape (a shard is ~1 GB by construction)."""
    length = F.octet_length(F.col("payload"))
    w = (
        Window.partitionBy("filename")
        .orderBy("position")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.coalesce(F.sum(length).over(w), F.lit(0))
    return records.select(
        surt_key(F.col("url")).alias("surt"),
        _ts14(records).alias("ts14"),
        "url",
        "mime",
        F.col("status").cast("int").alias("status"),
        F.md5(F.col("payload")).alias("digest"),
        length.cast("long").alias("length"),
        offset.cast("long").alias("offset"),
        "filename",
    )


def cdx_lines(cdx: DataFrame) -> DataFrame:
    """CDX rows -> one `line` string column (space-separated, the
    classic plain-CDX field order); write with df.write.text."""
    return cdx.select(
        F.concat_ws(
            " ",
            "surt", "ts14", "url", "mime",
            F.col("status").cast("string"),
            "digest",
            F.col("length").cast("string"),
            F.col("offset").cast("string"),
            "filename",
        ).alias("line")
    )


def mark_revisits(cdx: DataFrame) -> DataFrame:
    """WARC revisit detection over CDX rows (X93): per (surt, digest),
    the FIRST capture (by ts14, tie-broken filename/offset for
    determinism) is the stored `response`; every later byte-identical
    capture is a `revisit` referring back to it — ISO 28500's
    identical-payload-digest dedup profile, the mechanism that keeps
    Common Crawl from re-storing the unchanged 90% of the web each
    month. An intervening DIFFERENT digest does not reset the chain
    (the profile keys on payload identity, not adjacency).

    Adds (record_type, refers_to_ts14, refers_to_filename,
    refers_to_offset); refers_* are NULL on responses. One window
    partitioned by (surt, digest) — key cardinality ~ distinct
    captures, bounded by per-URL capture counts, never global.
    """
    w = (
        Window.partitionBy("surt", "digest")
        .orderBy("ts14", "filename", "offset")
    )
    rn = F.row_number().over(w)
    revisit = rn > 1
    return cdx.select(
        "*",
        F.when(revisit, F.lit("revisit"))
        .otherwise(F.lit("response"))
        .alias("record_type"),
        F.when(revisit, F.first("ts14").over(w)).alias("refers_to_ts14"),
        F.when(revisit, F.first("filename").over(w))
        .alias("refers_to_filename"),
        F.when(revisit, F.first("offset").over(w))
        .alias("refers_to_offset"),
    )


def revisit_savings(marked: DataFrame) -> DataFrame:
    """Storage the revisit profile saves, per shard filename: bytes
    and records that became pointers instead of payload copies. One
    narrow groupBy over the already-marked rows."""
    return marked.groupBy("filename").agg(
        F.count(F.when(F.col("record_type") == "revisit", 1))
        .alias("n_revisits"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("record_type") == "revisit", F.col("length")
                )
            ),
            F.lit(0),
        ).cast("long").alias("bytes_saved"),
        F.count(F.lit(1)).alias("n_records"),
    )


def archive_captures(captures: DataFrame, out_dir: str,
                     n_files: int | None = None) -> DataFrame:
    """Write captures as a WARC archive AND its CDX index (X95): the
    production shape — shards first, then one indexing pass over the
    written bytes so offsets are the REAL file spans (cdx_records over
    read_warc(with_offsets=True)), exactly how Common Crawl publishes
    warc/ next to cc-index/. Returns the CDX DataFrame read back from
    `{out_dir}/cdx` (parquet).

    `captures` needs (url, warc_ts timestamp, status int,
    payload string); record ids derive from md5_long(url) so the
    archive is deterministic for a given capture set.
    """
    from ptt_spider_go_spark.pipeline.common import md5_long
    from ptt_spider_go_spark.sources.warc import read_warc, write_warc

    spark = captures.sparkSession
    rows = captures.select(
        md5_long(F.col("url")).alias("doc_id"),
        "url",
        F.date_format(
            F.col("warc_ts").cast("timestamp"), "yyyy-MM-dd'T'HH:mm:ss'Z'"
        ).alias("warc_date"),
        F.col("status").cast("int").alias("status"),
        F.col("payload").cast("string").alias("payload"),
    )
    write_warc(rows, f"{out_dir}/warc", n_files=n_files)
    cdx = cdx_records(read_warc(spark, f"{out_dir}/warc",
                                with_offsets=True))
    cdx.write.mode("overwrite").parquet(f"{out_dir}/cdx")
    return spark.read.parquet(f"{out_dir}/cdx")
