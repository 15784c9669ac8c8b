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
