"""JSONL (newline-delimited JSON) source/sink with corrupt-record
quarantine.

JSONL is the interchange format most published web corpora actually
ship in (RedPajama, FineWeb, Dolma, OSCAR releases are .jsonl/.jsonl.gz
shards). Two production concerns the naive `spark.read.json` ignores:

1. **A corrupt line must never kill a 100 TB job.** Reading uses
   PERMISSIVE mode with a corrupt-record column; the batch splits into
   (good, quarantine) like the crawl's structured-error path
   (errors.py T9): quarantine rows carry the raw line and a cause so
   the pipeline can count/inspect/replay them, exactly what the
   fetch-log quarantine does for HTTP failures.
2. **Writing must be distributed with zero extra shuffles.** Each row
   renders to one JSON line JVM-side (`to_json`) and lands via
   `write.text` — every part file is a valid standalone JSONL shard
   because concatenation is the format's composition rule (the same
   argument as the WET writer, sources/wet.py).

Schema is caller-supplied and ENFORCED: a line that parses as JSON but
misses the schema (wrong type, malformed) is quarantined too — Spark
leaves non-conforming fields NULL in PERMISSIVE mode and fills the
corrupt column, so the split sees it. Field order in the written lines
follows the input schema (to_json preserves struct order),
deterministic for byte-level comparisons.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

#: name of the Spark corrupt-record side channel column
_CORRUPT = "_corrupt_record"


def write_jsonl(df: DataFrame, path: str, n_files: int = 8) -> None:
    """Render every row to one JSON line and write `n_files` text
    shards. Distributed, zero extra shuffles beyond the repartition
    that sets the shard count."""
    line = F.to_json(F.struct(*[F.col(c) for c in df.columns]))
    df.select(line.alias("value")).repartition(n_files).write.mode(
        "overwrite"
    ).text(path)


def read_jsonl(spark: SparkSession, path: str, schema: str
               ) -> tuple[DataFrame, DataFrame]:
    """Read JSONL with the given schema. Returns (good, quarantine):

    - good: rows matching the schema, corrupt column dropped;
    - quarantine: (raw_line, cause) for lines that failed to parse —
      same role as the crawl's fetch quarantine (errors.py).

    Implementation: text scan + `from_json` per line with the
    expression-level corrupt-record column, NOT `spark.read.json`
    with a source-level one — Spark disallows querying the
    source-level corrupt column without caching the whole parse
    ([UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN]), and a
    100 TB ingest can't afford a cache barrier. from_json populates
    the corrupt column for malformed bytes AND wrong-shape documents
    (a top-level array against a struct schema), while a valid object
    with missing fields keeps its row with NULL fields (standard
    JSONL tolerance) — so the good/quarantine split is one stateless
    projection. FAILFAST would kill the job on one bad byte,
    DROPMALFORMED silently loses data — neither is acceptable.
    """
    full_schema = f"{schema}, {_CORRUPT} string"
    raw = spark.read.text(path)
    parsed = raw.select(
        F.from_json(
            F.col("value"), full_schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT},
        ).alias("rec"),
    )
    good = parsed.filter(
        F.col(f"rec.{_CORRUPT}").isNull()
    ).select("rec.*").drop(_CORRUPT)
    quarantine = parsed.filter(F.col(f"rec.{_CORRUPT}").isNotNull()).select(
        F.col(f"rec.{_CORRUPT}").alias("raw_line"),
        F.lit("malformed_json").alias("cause"),
    )
    return good, quarantine
