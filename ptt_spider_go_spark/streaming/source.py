"""Layout-safe bounded parquet stream source.

The Structured Streaming file source requires its basePath to be a
DIRECTORY, so the two on-disk layouts a `<table>.parquet` name can have
need different wiring (ADVICE r04: the old unconditional
`pathGlobFilter=<name>` matched only the single-file layout and
silently streamed ZERO rows over a Spark-written part-file directory):

- single file  `sf_dir/table.parquet`          -> stream sf_dir with a
  pathGlobFilter on the file name (basePath = sf_dir, a directory);
- directory    `sf_dir/table.parquet/part-*`   -> stream the table path
  itself (it IS a directory, leaf part files are discovered normally).

Schema comes from a batch footer peek (the file source cannot infer
mid-stream); the peek also fails fast when the path does not exist,
so the zero-row failure mode cannot recur silently.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def read_table_stream(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Bounded file-source stream over `sf_dir/<name>.parquet` in either
    single-file or part-directory layout."""
    path = f"{sf_dir}/{name}.parquet"
    schema = spark.read.parquet(path).schema
    local = path.removeprefix("file://").removeprefix("file:")
    if os.path.isdir(local):
        return spark.readStream.schema(schema).parquet(path)
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", f"{name}.parquet")
        .parquet(sf_dir)
    )
