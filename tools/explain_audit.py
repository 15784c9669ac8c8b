"""Physical-plan audit over the whole driver-contract query surface.

For every queries() entry, capture the formatted physical plan and
check the plan properties that matter at 100 TB:

- column pruning: the parquet ReadSchema must not include columns the
  query doesn't use (flag when a documents/embeddings scan reads `text`
  or `embedding` for a query that doesn't touch them);
- predicate pushdown: filters on scan columns appear as PushedFilters;
- join strategy: small-side joins are broadcast, no accidental
  cartesian products (BroadcastNestedLoopJoin is expected only for the
  deliberate broadcast crossJoins in the ANN operators);
- whole-stage codegen: scalar pipelines run inside codegen stages;
- no single-partition funnels: a Window with an empty partitionBy (its
  formatted-plan Arguments carry only [exprs], [orderSpec] — no
  partition list) or an `Exchange SinglePartition` forces the whole
  input through one task — the classic invisible-at-sf0.1,
  stall-at-100TB regression (VERDICT r01 "What's wrong" #2).

Writes EXPLAIN_AUDIT.md with a per-query table + flagged findings and
the full plans for flagged queries. Usage:

    python tools/explain_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

import __spark_entry__ as E
from ptt_spider_go_spark.session import get_spark

# Queries where a BroadcastNestedLoopJoin / cross product is deliberate:
# a one-row (or n_planes-row) broadcast query-vector table.
CROSS_OK = {
    "ann_cosine_topk", "ann_lsh_buckets", "ann_lsh_topk", "ann_ivf_topk",
    # eval suite (tiny) broadcast-crossed against the train scan
    "semantic_decontaminate",
    # triangular step<=step joins over the superstep DIMENSION (one
    # ~KB sketch / count row per superstep — dozens of rows at any
    # crawl length); the non-equi join is the point (cumulative
    # union), and the 10^10-row fetch log is reduced to that
    # dimension by one groupBy before any of it happens.
    "hll_telemetry",
    # same pattern over the VALUE dimension (distinct lengths):
    # triangular v<=v ranks + 5-row probe-point non-equi joins.
    "quantile_telemetry",
    # r5j single-plan ADC scorer: the |eval|-row query-vector relation
    # (holdout-sized, broadcast by construction) crossed against the
    # coded vectors — the deliberate replacement for the 51-branch
    # per-query union (BASELINE r5j); the IVF variant joins on the
    # probe relation instead and needs no cross.
    "pq_adc_topk",
}
# Queries that run a full superstep pipeline / streaming job — plans are
# multi-job, skip static audit.
SKIP = {"crawl_articles", "crawl_markdown", "crawl_metrics",
        "crawl_quarantine", "stream_windowed_counts", "stream_sessionize"}


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def audit_one(name: str, df) -> dict:
    plan = plan_of(df)
    flags = []
    scans = re.findall(r"Scan parquet[^\n]*\n(?:.*?\n)*?(?=\(\d+\)|\Z)", plan)
    ids = re.findall(r"\[codegen id : (\d+)\]", plan)
    n_codegen = len(set(ids))
    joins = re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)", plan)

    if "CartesianProduct" in joins:
        flags.append("CartesianProduct (unpartitioned cross join)")
    if "BroadcastNestedLoopJoin" in joins and name not in CROSS_OK:
        flags.append("BroadcastNestedLoopJoin outside the ANN cross-join set")

    # Single-partition funnels: a Window whose Arguments line has only
    # two bracketed lists ([exprs], [orderSpec]) has an empty
    # partitionBy -> the whole input crosses one task. Same for any
    # non-broadcast Exchange planned as SinglePartition.
    # Arguments are [exprs], [partitionSpec], [orderSpec]; an un-ordered
    # partitionBy window omits the third list, a partition-less ordered
    # window omits the second — disambiguate the 2-list case by whether
    # the trailing list is a sort spec (ASC/DESC entries).
    for m in re.finditer(r"\(\d+\) Window(?:\n[^\n]*)*?\nArguments: ([^\n]*)", plan):
        args = m.group(1)
        tail = args.rsplit("], [", 1)[-1]
        if args.count("], [") < 2 and re.search(r"\b(ASC|DESC)\b", tail):
            flags.append("partition-less Window (single-partition sort of "
                         "entire input)")
            break
    for m in re.finditer(
            r"\((\d+)\) Exchange\nInput[^\n]*\nArguments: SinglePartition",
            plan):
        # A SinglePartition exchange fed by a KEYLESS PARTIAL aggregate
        # is the textbook global-aggregate reduce: map-side partials
        # combine first and exactly ONE tiny partial row per upstream
        # partition crosses the exchange (corpus_digest's shape). Only
        # an exchange moving actual data rows is a funnel.
        n = int(m.group(1))
        child = re.search(
            rf"\({n - 1}\) HashAggregate(?:\n[^\n]*)*?\nKeys: \[\]"
            rf"(?:\n[^\n]*)*?partial_",
            plan,
        )
        if not child:
            flags.append("Exchange SinglePartition (global funnel)")
            break

    # ReadSchema bloat: text/embedding/html read but unused in output.
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0] for c in m.group(1).split(",") if c]
        for heavy in ("text", "embedding", "html"):
            if heavy in cols and heavy not in [f.lower() for f in df.columns]:
                # heavy col feeding a derived expr is fine; only flag
                # when it is also absent from all filters/aggs — cheap
                # heuristic: flag only if it never appears elsewhere in
                # the plan body.
                uses = len(re.findall(rf"\b{heavy}\b", plan))
                if uses <= 1:
                    flags.append(f"scan reads unused heavy column `{heavy}`")
    return {
        "name": name,
        "joins": ",".join(sorted(set(joins))) or "-",
        "codegen_stages": n_codegen,
        "pushed": "PushedFilters: [" in plan and not re.search(
            r"PushedFilters: \[\]", plan) or False,
        "flags": flags,
        "plan": plan,
    }


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="explain-audit", master="local[4]",
                      shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for name, fn in E.queries().items():
        if name in SKIP or (only and name not in only):
            continue
        try:
            rows.append(audit_one(name, fn(spark, sf_dir)))
        except Exception as ex:  # noqa: BLE001
            rows.append({"name": name, "joins": "-", "codegen_stages": 0,
                         "pushed": False, "flags": [f"ERROR {ex}"], "plan": ""})

    flagged = [r for r in rows if r["flags"]]
    with open("EXPLAIN_AUDIT.md", "w") as f:
        f.write("# Physical-plan audit (tools/explain_audit.py)\n\n")
        f.write(f"sf_dir: `{sf_dir}` — {len(rows)} queries audited, "
                f"{len(flagged)} flagged.\n\n")
        f.write("| query | joins | codegen stages | pushed filters | flags |\n")
        f.write("|---|---|---|---|---|\n")
        for r in rows:
            f.write(
                f"| {r['name']} | {r['joins']} | {r['codegen_stages']} | "
                f"{'y' if r['pushed'] else '-'} | "
                f"{'; '.join(r['flags']) or '-'} |\n"
            )
        if flagged:
            f.write("\n## Flagged plans\n")
            for r in flagged:
                f.write(f"\n### {r['name']}\n\n```\n{r['plan']}\n```\n")
    for r in rows:
        mark = "FLAG" if r["flags"] else "ok  "
        print(f"{mark} {r['name']}: joins={r['joins']} "
              f"codegen={r['codegen_stages']} {'; '.join(r['flags'])}")
    print(f"\n{len(flagged)} flagged / {len(rows)} audited -> EXPLAIN_AUDIT.md")
    spark.stop()


if __name__ == "__main__":
    main()
