"""TrustRank / spam-mass / OPIC (operators/linkrank.py X102-X104):
pure-Python mirrors of the BIGINT recurrences on hand graphs plus the
semantic invariants each one exists for — trust never reaches a
disconnected spam ring, spam mass flags exactly the ring, OPIC banks
a conserved cash total. (Spark-vs-DuckDB parity is additionally
enforced by the `trust_rank` / `spam_mass` / `opic_importance`
contract oracles.)
"""

from collections import defaultdict

from ptt_spider_go_spark.operators import linkrank

#: chain from the trusted seed + a 2-host reciprocal spam ring that no
#: trusted path reaches (the canonical TrustRank separation example).
CHAIN_AND_RING = [
    ("a", "b"), ("b", "c"),
    ("d", "e"), ("e", "d"), ("d", "e"),
]


def _trust_mirror(edges, seeds, iters):
    nodes = {h for e in edges for h in e}
    seeds = sorted(set(seeds) & nodes)
    if not seeds:
        return {h: 0 for h in nodes}
    outdeg = defaultdict(int)
    for s, _ in edges:
        outdeg[s] += 1
    t0 = linkrank.TRUST_SCALE // len(seeds)
    tele = linkrank.TRUST_TELEPORT_TOTAL // len(seeds)
    t = {h: (t0 if h in seeds else 0) for h in nodes}
    for _ in range(iters):
        inflow = defaultdict(int)
        for s, d in edges:
            inflow[d] += t[s] // outdeg[s]
        t = {
            h: (tele if h in seeds else 0)
            + linkrank.DAMP_NUM * inflow[h] // linkrank.DAMP_DEN
            for h in nodes
        }
    return t


def _trust(spark, edges, seeds, iters=3):
    e = spark.createDataFrame(edges, "src string, dst string")
    s = spark.createDataFrame([(h,) for h in seeds], "host string")
    return {
        r["host"]: r["trust_micro"]
        for r in linkrank.trust_rank(e, s, iters=iters).collect()
    }


def test_trust_matches_mirror_each_round(spark):
    for iters in (1, 2, 3):
        assert _trust(spark, CHAIN_AND_RING, ["a"], iters) == \
            _trust_mirror(CHAIN_AND_RING, ["a"], iters)


def test_trust_never_reaches_disconnected_ring(spark):
    """The module's reason to exist: hosts reachable only through the
    spam ring accumulate exactly zero trust, while the trusted chain
    decays but stays positive."""
    got = _trust(spark, CHAIN_AND_RING, ["a"], 3)
    assert got["d"] == 0 and got["e"] == 0
    assert got["a"] > got["b"] > got["c"] > 0


def test_trust_seed_outside_graph_ignored_and_empty_seed_zero(spark):
    """A seed host with no edges cannot carry trust (it is not a
    node); an empty effective seed set yields all-zero trust, not a
    division by zero."""
    got = _trust(spark, CHAIN_AND_RING, ["nope"], 2)
    assert set(got.values()) == {0}
    # a present seed + an absent one: mass splits over the PRESENT one
    assert _trust(spark, CHAIN_AND_RING, ["a", "nope"], 2) == \
        _trust_mirror(CHAIN_AND_RING, ["a"], 2)


def test_spam_mass_flags_exactly_the_ring(spark):
    """The ring's reciprocal links farm rank but carry no trust ->
    spam_mass_ppm = 1e6 and candidate=True iff rank clears the floor;
    the trusted chain's hosts stay below threshold."""
    e = spark.createDataFrame(CHAIN_AND_RING, "src string, dst string")
    s = spark.createDataFrame([("a",)], "host string")
    out = {
        r["host"]: r
        for r in linkrank.spam_mass(
            linkrank.host_rank(e),
            linkrank.trust_rank(e, s),
            min_rank_micro=0,
        ).collect()
    }
    for h in ("d", "e"):
        assert out[h]["trust_scaled"] == 0
        assert out[h]["spam_mass_ppm"] == 1_000_000
        assert out[h]["is_spam_candidate"]
    # seed host: trust_scaled exceeds its own rank share -> mass 0-ish
    assert out["a"]["spam_mass_ppm"] < 900_000
    assert not out["a"]["is_spam_candidate"]


def test_spam_mass_rank_floor_suppresses_low_rank_hosts(spark):
    """With the default floor at the uniform start rank, a ring whose
    rank stays below it is NOT flagged — low-rank mass is noise."""
    e = spark.createDataFrame(CHAIN_AND_RING, "src string, dst string")
    s = spark.createDataFrame([("a",)], "host string")
    ranks = linkrank.host_rank(e)
    floor = 1 + max(
        r["rank_micro"] for r in ranks.collect()
    )
    out = linkrank.spam_mass(
        ranks, linkrank.trust_rank(e, s), min_rank_micro=floor
    )
    assert out.filter("is_spam_candidate").count() == 0


def _opic_mirror(edges, iters):
    nodes = sorted({h for e in edges for h in e})
    outdeg = defaultdict(int)
    for s, _ in edges:
        outdeg[s] += 1
    n = len(nodes)
    cash = {h: linkrank.OPIC_SCALE // n for h in nodes}
    hist = {h: 0 for h in nodes}
    for _ in range(iters):
        dang = sum(c for h, c in cash.items() if outdeg[h] == 0)
        share = dang // n
        inflow = defaultdict(int)
        for s, d in edges:
            inflow[d] += cash[s] // outdeg[s]
        hist = {h: hist[h] + cash[h] for h in nodes}
        cash = {h: inflow[h] + share for h in nodes}
    return {h: (hist[h], cash[h]) for h in nodes}


def _opic(spark, edges, iters):
    e = spark.createDataFrame(edges, "src string, dst string")
    return {
        r["host"]: (r["history_micro"], r["cash_micro"])
        for r in linkrank.opic_importance(e, iters=iters).collect()
    }


def test_opic_matches_mirror_with_dangling_recycling(spark):
    """Chain with a dangling tail: the tail's cash must recycle
    through the virtual root back to every host."""
    edges = [("a", "b"), ("b", "c"), ("a", "c")]  # c dangles
    for iters in (1, 2, 4):
        assert _opic(spark, edges, iters) == _opic_mirror(edges, iters)


def test_opic_history_is_banked_cash_and_nearly_conserved(spark):
    """After k rounds the banked history totals k * OPIC_SCALE minus
    only DIV truncation dust (< (edges + nodes) per round) — cash is
    conserved through the virtual root, the property that makes
    history an anytime importance estimate."""
    edges = [("a", "b"), ("b", "c"), ("a", "c"), ("d", "a")]
    k = 4
    got = _opic(spark, edges, k)
    total_hist = sum(h for h, _ in got.values())
    dust_bound = k * (len(edges) + len(got))
    assert 0 <= k * linkrank.OPIC_SCALE - total_hist <= dust_bound


def test_opic_importance_orders_by_reachability(spark):
    """The hub everything points at banks the most history."""
    edges = [("a", "z"), ("b", "z"), ("c", "z"), ("z", "a")]
    got = _opic(spark, edges, 4)
    assert got["z"][0] == max(h for h, _ in got.values())


def test_demoted_budgets_redistribute_and_audit(spark):
    """Flagged ring hosts get explicit zero-budget demoted rows; the
    clean hosts' budgets still sum EXACTLY to the total (the ring's
    share redistributes, never vanishes)."""
    e = spark.createDataFrame(CHAIN_AND_RING, "src string, dst string")
    s = spark.createDataFrame([("a",)], "host string")
    ranks = linkrank.host_rank(e)
    spam = linkrank.spam_mass(
        ranks, linkrank.trust_rank(e, s), min_rank_micro=0
    )
    out = {r["host"]: r for r in
           linkrank.demoted_budgets(ranks, spam, 600).collect()}
    assert len(out) == 5  # every host present exactly once
    for h in ("d", "e"):
        assert out[h]["demoted"] and out[h]["budget"] == 0
    clean_sum = sum(r["budget"] for r in out.values() if not r["demoted"])
    assert clean_sum == 600


def test_demoted_budgets_no_candidates_is_authority_budgets(spark):
    """With nothing flagged, demoted_budgets degrades to plain
    authority_budgets plus an all-false demoted column."""
    e = spark.createDataFrame(CHAIN_AND_RING, "src string, dst string")
    s = spark.createDataFrame([("a",)], "host string")
    ranks = linkrank.host_rank(e)
    spam = linkrank.spam_mass(
        ranks, linkrank.trust_rank(e, s),
        threshold_ppm=2_000_000,  # unreachable
    )
    got = {r["host"]: (r["budget"], r["demoted"]) for r in
           linkrank.demoted_budgets(ranks, spam, 100).collect()}
    plain = {r["host"]: r["budget"] for r in
             linkrank.authority_budgets(ranks, 100).collect()}
    assert {h: b for h, (b, _) in got.items()} == plain
    assert not any(d for _, d in got.values())
