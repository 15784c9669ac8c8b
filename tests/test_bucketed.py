"""Bucketed-table co-located joins: the no-shuffle property, proven on
the physical plan (sinks/bucketed.py)."""

import pytest
from pyspark.sql import functions as F

from ptt_spider_go_spark.sinks.bucketed import (
    bucketed_join,
    plan_has_exchange,
    write_bucketed,
)


@pytest.fixture()
def no_broadcast(spark):
    """Disable auto-broadcast so the join strategy under test is the
    sort-merge/bucket path, not a broadcast of the tiny test tables."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, tmp_path, no_broadcast):
    docs = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).alias("feature"),
    )
    scores = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 13).cast("double").alias("score"),
    )
    write_bucketed(docs, "b_docs", "doc_id", 8, str(tmp_path / "b_docs"),
                   sort_col="doc_id")
    write_bucketed(scores, "b_scores", "doc_id", 8, str(tmp_path / "b_scores"),
                   sort_col="doc_id")
    try:
        joined = bucketed_join(spark, "b_docs", "b_scores", on="doc_id")
        # the whole point: identical bucket specs -> zero Exchange
        assert not plan_has_exchange(joined)
        assert joined.count() == 1000
        # control: the same join on unbucketed frames DOES shuffle
        control = docs.join(scores, on="doc_id")
        assert plan_has_exchange(control)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_docs")
        spark.sql("DROP TABLE IF EXISTS b_scores")


def test_bucketed_aggregation_has_no_exchange(spark, tmp_path, no_broadcast):
    """groupBy on the bucket key also skips its shuffle — partial and
    final aggregation collapse into one stage per bucket."""
    docs = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("v")
    )
    write_bucketed(docs, "b_agg", "doc_id", 8, str(tmp_path / "b_agg"))
    try:
        agg = spark.table("b_agg").groupBy("doc_id").agg(F.sum("v").alias("s"))
        assert not plan_has_exchange(agg)
        assert agg.count() == 1000
    finally:
        spark.sql("DROP TABLE IF EXISTS b_agg")
