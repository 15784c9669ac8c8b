"""ptt_spider_go_spark — a PySpark-native frontier-crawl analytics engine.

A from-scratch reimplementation of the query/data semantics of
twtrubiks/ptt-spider-go as an iterative frontier pipeline over
Common-Crawl-style pages tables (url, warc_ts, html, text, lang),
expressed with the DataFrame API + Arrow-vectorized UDFs.
"""

__version__ = "0.1.0"
