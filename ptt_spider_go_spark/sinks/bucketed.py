"""Bucketed table sink: co-located joins without a shuffle.

At 100 TB the single most valuable physical property a table can have
is bucketing on its join key: two tables bucketed by the same key into
the same bucket count join with ZERO exchange — each task reads bucket
i of both sides. This is Spark's `bucketBy` (hash bucketing on write,
recorded in the catalog) and the exact analogue of an Iceberg
`bucket(N, key)` partition transform; the crawl's pages/seen/frontier
tables and the pipeline's documents/embeddings tables all want it on
url/doc_id/vec_id.

`write_bucketed` is the thin sink; `assert_no_exchange_join` is the
guard the tests use to prove the property actually holds in the plan
(a regression here silently re-introduces two full shuffles per join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   n_buckets: int, path: str,
                   sort_col: str | None = None) -> None:
    """Write `df` as a bucketed (optionally per-bucket-sorted) parquet
    table registered in the session catalog at `path`. Sorting within
    buckets additionally removes the sort from sort-merge joins and
    enables per-bucket min/max skipping."""
    w = (
        df.write.mode("overwrite").format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, bucket_col)
    )
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: str) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key. With
    matching bucket specs Spark plans this with no Exchange on either
    side (bucket i ⋈ bucket i per task)."""
    return spark.table(left_table).join(spark.table(right_table), on=on)


def plan_has_exchange(df: DataFrame) -> bool:
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    return "Exchange" in plan
