"""X117: order-independent corpus digest. Pins: invariance under row
order and partitioning; sink round-trip equality (the real use);
single-row mutations detected; and the multiset property — a
duplicated pair cancels in XOR but not in the modular sum, which is
why both are reported."""

from __future__ import annotations

from pyspark.sql import functions as F

from ptt_spider_go_spark.pipeline.report import corpus_digest


def _docs(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("lang"), (F.col("id") % 3).cast("string"))
        .alias("lang"),
        F.concat(F.lit("text body "), F.col("id").cast("string"))
        .alias("text"),
    )


def _d(df):
    r = corpus_digest(df).first()
    return (r["n_rows"], r["digest_sum"], r["digest_xor"])


def test_digest_invariant_under_order_and_partitioning(spark):
    df = _docs(spark)
    base = _d(df)
    assert _d(df.repartition(17)) == base
    assert _d(df.orderBy(F.desc("doc_id"))) == base
    assert _d(df.coalesce(1)) == base


def test_digest_roundtrips_through_a_sink(spark, tmp_path):
    df = _docs(spark)
    path = str(tmp_path / "corpus.parquet")
    df.repartition(7).write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    assert _d(back.select("doc_id", "lang", "text")) == _d(df)


def test_digest_detects_single_row_mutation(spark):
    df = _docs(spark)
    mutated = df.withColumn(
        "text",
        F.when(F.col("doc_id") == 123, F.lit("tampered"))
        .otherwise(F.col("text")),
    )
    a, b = _d(df), _d(mutated)
    assert a[0] == b[0] and (a[1] != b[1] or a[2] != b[2])


def test_digest_sum_catches_the_xor_blind_spot(spark):
    """S vs S plus a row duplicated TWICE: xor cancels the pair
    (identical), the modular sum does not — the multiset case."""
    df = _docs(spark, n=50)
    extra = df.filter(F.col("doc_id") == 7)
    doubled = df.unionByName(extra).unionByName(extra)
    a, b = _d(df), _d(doubled)
    assert a[2] == b[2]          # xor is blind to the duplicated pair
    assert a[1] != b[1]          # the modular sum is not
    assert b[0] == a[0] + 2


def test_digest_null_vs_empty_string_differ(spark):
    base = spark.createDataFrame(
        [(1, "en", None)], "doc_id long, lang string, text string")
    empty = spark.createDataFrame(
        [(1, "en", "")], "doc_id long, lang string, text string")
    assert _d(base) != _d(empty)
