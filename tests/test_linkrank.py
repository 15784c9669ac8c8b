"""Integer PageRank host ranking (operators/linkrank.py): pure-Python
mirror of the BIGINT recurrence on hand graphs, plus edge-derivation
invariants. (Spark-vs-DuckDB parity is additionally enforced on
`link_rank` by the driver contract / tools/check_contract.py.)
"""

from collections import defaultdict

from ptt_spider_go_spark.operators import linkrank


def _mirror(edges, iters):
    """The exact integer recurrence, driver-side."""
    nodes = {h for e in edges for h in e}
    outdeg = defaultdict(int)
    for s, _ in edges:
        outdeg[s] += 1
    r = {h: linkrank.R0_MICRO for h in nodes}
    for _ in range(iters):
        inflow = defaultdict(int)
        for s, d in edges:
            inflow[d] += r[s] // outdeg[s]
        r = {
            h: linkrank.TELEPORT_MICRO
            + linkrank.DAMP_NUM * inflow[h] // linkrank.DAMP_DEN
            for h in nodes
        }
    return r


def _rank(spark, edges, iters):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {
        r["host"]: r["rank_micro"]
        for r in linkrank.host_rank(df, iters=iters).collect()
    }


def test_star_graph_matches_mirror(spark):
    """Hub z absorbs three spokes' rank and feeds one back to a."""
    edges = [("a", "z"), ("b", "z"), ("c", "z"), ("z", "a")]
    for iters in (1, 2, 3):
        assert _rank(spark, edges, iters) == _mirror(edges, iters)


def test_duplicate_edges_weigh_more(spark):
    """A host linked from many pages of the same src gets a larger
    share of that src's rank (duplicate edges are kept by design)."""
    edges = [("s", "heavy"), ("s", "heavy"), ("s", "heavy"), ("s", "light")]
    got = _rank(spark, edges, 1)
    assert got == _mirror(edges, 1)
    assert got["heavy"] > got["light"]


def test_dangling_and_no_inlink_nodes(spark):
    """Dangling dst-only nodes keep teleport-only rank; the recurrence
    never divides by a missing outdegree."""
    edges = [("a", "b"), ("b", "c")]  # c dangles
    got = _rank(spark, edges, 2)
    assert got == _mirror(edges, 2)
    # a has no inlinks after iteration 1: teleport only
    assert got["a"] == linkrank.TELEPORT_MICRO


def test_document_edges_deterministic_no_self_loops(spark):
    docs = spark.createDataFrame(
        [(i, "t", "en") for i in range(200)],
        "doc_id long, text string, lang string",
    )
    e1 = sorted(map(tuple, linkrank.host_edges_from_documents(docs).collect()))
    e2 = sorted(map(tuple, linkrank.host_edges_from_documents(docs).collect()))
    assert e1 == e2
    assert all(s != d for s, d in e1)
    # 3 outlinks per doc minus the md5-collision self-loops
    assert len(e1) <= 600 and len(e1) > 550


def test_authority_budgets_hand_case_and_exact_sum(spark):
    """ranks {a:3, b:1}, total 10: base a=7 b=2, one leftover unit,
    remainders tie (2 vs 2) -> host asc gives it to a."""
    ranks = spark.createDataFrame(
        [("a", 3), ("b", 1)], "host string, rank_micro long"
    )
    got = {r["host"]: r["budget"]
           for r in linkrank.authority_budgets(ranks, 10).collect()}
    assert got == {"a": 8, "b": 2}

    ranks2 = spark.createDataFrame(
        [(f"h{i}", 150000 + 37 * i * i) for i in range(23)],
        "host string, rank_micro long",
    )
    budgets = {r["host"]: r["budget"]
               for r in linkrank.authority_budgets(ranks2, 1000).collect()}
    assert sum(budgets.values()) == 1000
    # monotone in rank (largest-remainder never inverts order by > 1)
    assert budgets["h22"] > budgets["h0"]


def test_authority_budgets_compose_with_budget_gate(spark):
    """The allocator output IS budget_gate's host_budgets override:
    per-host admissions never exceed the allocated budget and deferred
    rows complement exactly."""
    from pyspark.sql import functions as F

    from ptt_spider_go_spark.operators.politeness import budget_gate

    urls = [
        (f"https://{h}/p{i}", 1, i, 1700000000 + i)
        for h in ("big.example", "small.example")
        for i in range(50)
    ]
    frontier = spark.createDataFrame(
        urls, "url string, kind_rank int, page_no int, ts long"
    ).withColumn("warc_ts", F.timestamp_seconds(F.col("ts"))).drop("ts")
    ranks = spark.createDataFrame(
        [("big.example", 3_000_000), ("small.example", 1_000_000)],
        "host string, rank_micro long",
    )
    budgets = linkrank.authority_budgets(ranks, 40)
    bmap = {r["host"]: r["budget"] for r in budgets.collect()}
    assert bmap == {"big.example": 30, "small.example": 10}
    admitted, deferred = budget_gate(frontier, 0, salt=4,
                                     host_budgets=budgets)
    adm = {
        r["h"]: r["n"]
        for r in admitted.groupBy(
            F.expr("parse_url(url, 'HOST')").alias("h")
        ).agg(F.count("*").alias("n")).collect()
    }
    assert adm["big.example"] <= 30 and adm["small.example"] <= 10
    assert admitted.count() + deferred.count() == 100
