"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over ptt_spider_go_spark.contract — see that module for
the full query surface (SURVEY.md §2 operator analogues, training-data
pipeline operators, and the rows-only crawl end-to-end queries).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ptt_spider_go_spark import contract


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return contract.entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return contract.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return contract.oracle_sql()
