"""Print the current deterministic-crawl output hashes for the three
hash-pinned contract queries. Run after an INTENTIONAL crawl behavior
change and copy the values into contract.CRAWL_PINS.

    python tools/pin_crawl_hashes.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from ptt_spider_go_spark import contract
from ptt_spider_go_spark.session import get_spark


def main():
    spark = get_spark(app_name="pin-crawl-hashes", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    res = contract._crawl_result(spark)
    for label, df in (
        ("crawl_articles", res.articles),
        ("crawl_markdown", res.markdown_docs),
        ("crawl_metrics", res.metrics),
        ("crawl_quarantine",
         res.quarantine.withColumn("context", F.to_json(F.col("context")))),
    ):
        contract._pin_hash(df, None, label)
    spark.stop()


if __name__ == "__main__":
    main()
