"""WET-style extracted-text archive source/sink.

Common Crawl publishes extracted page text as WET archives: a stream
of records, each a small header block (target URI, content length)
followed by the plain text. Every web-scale corpus pipeline starts by
reading this shape, so the engine carries a deterministic WET-style
format of its own (the sandbox has no real CC data; the FORMAT
round-trip is the deliverable):

    WET/1.0
    Record-ID: <doc_id>
    Lang: <lang>
    Source: <source>
    Content-Length: <utf-8 byte length of text>
    <blank line>
    <text>

`write_wet` is fully distributed with zero extra shuffles: each record
is rendered to one string column and written with `write.text` — every
emitted part file is therefore a well-formed multi-record WET file
(records are self-delimiting via Content-Length, so concatenation is
the format's composition rule, exactly like real WARC/WET).

`read_wet` mirrors how production systems read WET at scale (cc_net,
resiliparse, Spark CC pipelines): the FILE is the split unit — real
WET shards are per-record-gzip'd ~150 MB files that cannot be split
mid-stream anyway — so the reader lists files with the binaryFile
source and parses each file's bytes in an Arrow-batched mapInPandas
kernel. Parallelism = number of shard files, the same contract CC
processing has; the binaryFile 2 GB per-file ceiling comfortably
holds the ~150 MB-1 GB shard sizes the format is published in.

Content-Length counts UTF-8 BYTES (octet_length on the write side,
byte slicing on the read side), so multi-byte text round-trips
exactly and embedded newlines in text cannot confuse the parser.

Reference parity: the reference ingests live HTML (client.go); a
bulk extracted-text archive source is extension X40 (SURVEY §2).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

WET_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("lang", StringType()),
    StructField("source", StringType()),
    StructField("text", StringType()),
])


def write_wet(docs: DataFrame, path: str, n_files: int | None = None) -> None:
    """Render (doc_id, lang, source, text) rows as WET records and
    write them as `n_files` WET shard files (part files of a text
    write — each is a valid standalone WET file). One narrow
    projection; the only movement is the optional repartition that
    sets the shard count."""
    rec = F.concat(
        F.lit("WET/1.0\nRecord-ID: "), F.col("doc_id").cast("string"),
        F.lit("\nLang: "), F.col("lang"),
        F.lit("\nSource: "), F.col("source"),
        F.lit("\nContent-Length: "),
        F.octet_length(F.col("text")).cast("string"),
        F.lit("\n\n"), F.col("text"),
    )
    out = docs.select(rec.alias("value"))
    if n_files is not None:
        out = out.repartition(n_files)
    out.write.mode("overwrite").text(path)


def _parse_wet_bytes(blob: bytes) -> Iterator[tuple[int, str, str, str]]:
    """Parse one WET shard's bytes into records. Headers are ASCII
    lines up to a blank line; the body is exactly Content-Length
    bytes, followed by the record separator newline."""
    i, n = 0, len(blob)
    while i < n:
        # Skip the separator newlines between records (write.text adds
        # one '\n' per row; tolerate more for hand-concatenated files).
        while i < n and blob[i:i + 1] == b"\n":
            i += 1
        if i >= n:
            break
        headers: dict[str, str] = {}
        if blob[i:i + 8] != b"WET/1.0\n":
            raise ValueError(f"WET: bad magic at byte {i}")
        i += 8
        while True:
            j = blob.index(b"\n", i)
            line = blob[i:j].decode("utf-8")
            i = j + 1
            if not line:
                break  # blank line: body follows
            k, _, v = line.partition(": ")
            headers[k] = v
        length = int(headers["Content-Length"])
        body = blob[i:i + length].decode("utf-8")
        i += length
        yield (int(headers["Record-ID"]), headers.get("Lang", ""),
               headers.get("Source", ""), body)


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """Read a directory of WET shard files as a (doc_id, lang, source,
    text) DataFrame. File-per-task via the binaryFile source (module
    docstring: the split unit real WET processing uses), records
    parsed in one Arrow-batched mapInPandas pass."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "part-*")
        .load(path)
        .select("content")
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                rec
                for blob in pdf["content"]
                for rec in _parse_wet_bytes(bytes(blob))
            ]
            yield pd.DataFrame(
                rows, columns=["doc_id", "lang", "source", "text"]
            )

    return files.mapInPandas(parse, schema=WET_SCHEMA)
