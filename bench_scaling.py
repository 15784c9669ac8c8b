"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

The sandbox has no multi-executor cluster, so the N -> 4N executor
criterion is evidenced by running the identical crawl job at two local
parallelism levels (local[N] and local[4N]) on the same on-disk pages
dataset and reporting throughput at both plus scaling efficiency

    eff = throughput(4N) / (4 * throughput(N))      (target >= 0.8)

Methodology notes:
- The workload is sized so parse/join compute dominates (hundreds of
  CPU-seconds); at toy sizes the measurement is pure scheduler latency
  and says nothing about scaling.
- Each session runs a small untimed warmup crawl first: JVM JIT +
  Python-worker pool startup (~5 s) is session overhead, not crawl
  throughput, and a real cluster amortizes it over hours.
- The pages parquet is written sorted by url so the landing-page probe
  benefits from row-group pruning (the layout an Iceberg table of
  pages would use).

Usage: python bench_scaling.py [--n 8] [--boards 8] [--ppb 3000] [--slots 60]
Writes BENCH_SCALING.json and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ptt_spider_go_spark.config import CrawlConfig
from ptt_spider_go_spark.datagen import pages_df
from ptt_spider_go_spark.plans.crawl import run_crawl
from ptt_spider_go_spark.session import get_spark


def _crawl(spark, pages, boards, ppb, salt):
    cfg = CrawlConfig(
        board=boards[0], pages=ppb, push_rate=10, host_salt=salt,
        max_supersteps=8, superstep_ms=60_000_000, workers=64,
    )
    res = run_crawl(spark, pages, cfg, boards=boards, verify_text=False)
    res.articles.write.format("noop").mode("overwrite").save()
    res.download_tasks.write.format("noop").mode("overwrite").save()
    return res.fetch_log.count(), res.supersteps


def run_once(cpus: int, pages_path: str, boards: list[str], ppb: int) -> dict:
    spark = get_spark(
        app_name=f"scaling-{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(pages_path)

    # Untimed warmup: JIT + Python worker pool + parquet footer cache.
    _crawl(spark, pages, boards[:1], 3, cpus)

    t0 = time.time()
    fetched, supersteps = _crawl(spark, pages, boards, ppb, cpus)
    wall = time.time() - t0
    spark.stop()
    return {
        "cpus": cpus,
        "wall_sec": round(wall, 2),
        "urls_fetched": fetched,
        "urls_per_sec": round(fetched / wall, 1),
        "supersteps": supersteps,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--boards", type=int, default=8)
    ap.add_argument("--ppb", type=int, default=3000)
    ap.add_argument("--slots", type=int, default=60)
    args = ap.parse_args()

    boards = [f"Board{i}" for i in range(args.boards)]
    pages_path = f"/tmp/ptt_scaling_pages_{args.boards}x{args.ppb}x{args.slots}"
    if not os.path.exists(pages_path):
        spark = get_spark(app_name="scaling-gen", master="local[32]",
                          shuffle_partitions=32)
        spark.sparkContext.setLogLevel("ERROR")
        df = pages_df(
            spark, boards=tuple(boards), pages_per_board=args.ppb,
            slots_per_page=args.slots, parallelism=256, with_text=False,
        )
        # Sort by url: row-group pruning for point lookups (probe) —
        # the sort order an Iceberg pages table would declare.
        df.repartitionByRange(64, "url").sortWithinPartitions("url") \
            .write.mode("overwrite").parquet(pages_path)
        spark.stop()

    lo = run_once(args.n, pages_path, boards, args.ppb)
    hi = run_once(args.n * 4, pages_path, boards, args.ppb)
    eff = hi["urls_per_sec"] / (4 * lo["urls_per_sec"])
    out = {
        "metric": "crawl scaling efficiency N->4N (local parallelism)",
        "n": args.n,
        "low": lo,
        "high": hi,
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    with open("BENCH_SCALING.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
