"""Redirect-chain resolution over the fetch log's 3xx edges.

The reference follows HTTP redirects implicitly inside its client (Go's
net/http follows up to 10 hops before erroring); a batch crawler that
records raw responses instead gets a RELATION of redirect edges
(src_url -> Location) and must resolve every chain offline: the frontier
should enqueue the landing URL, the seen-set should credit the whole
chain, and link-graph edges should point at final targets, not hop-1
aliases (Common Crawl's crawl-diagnostics does exactly this join).

The redirect relation is FUNCTIONAL — a URL has at most one Location —
so resolution is successor iteration on a functional graph. The naive
walk is O(chain length) joins; at web scale chains are short (HTTP
clients cap at 5-20 hops) but the frontier is 10^10 rows, so rounds
dominate. We use **pointer doubling**: maintain for every URL the node
reached after up-to-2^k steps (frozen once a terminal is hit); each
round self-joins the mapping onto itself, doubling the horizon, so
`ceil(log2(max_hops))` rounds cover any resolvable chain — 3 shuffle
rounds for the HTTP-practical cap of 8 instead of 8, with lineage cut
per round exactly like the connected-components loop
(pipeline/clusters.py). Cycles (A->B->A, the classic mis-configured
http<->https bounce) never reach a terminal and surface as
status='capped' with NULL final_url — same contract as Go's
"stopped after 10 redirects" error (net/http/client.go), made
relational.

Scale shape: the mapping is one row per distinct URL; each round is one
equi-join on it (sort-merge at frontier scale, AQE-broadcast when the
redirect set is small). No driver-side state; hop counts are exact
integers (each round ADDS the successor's walked distance, so `hops` is
the true chain length, not a power of two).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F


def resolve_redirects(edges: DataFrame, max_hops: int = 8) -> DataFrame:
    """Resolve every URL in `edges` (columns src, dst — at most one dst
    per src) to its redirect landing.

    Returns (url, final_url, hops, status) for every URL appearing as a
    src or dst:

    - status='ok':      a terminal (no outgoing redirect) was reached in
                        <= max_hops steps; final_url is the landing,
                        hops the exact chain length (0 for terminals).
    - status='capped':  no terminal within max_hops (over-long chain or
                        a redirect cycle); final_url/hops are NULL.
    """
    e = edges.select("src", "dst")
    nodes = (
        e.select(F.col("src").alias("url"))
        .unionByName(e.select(F.col("dst").alias("url")))
        .distinct()
    )

    # m(url) = node reached after up-to-2^k steps, frozen at terminals:
    # seed with one step (terminals: 0 steps, done immediately).
    # nodes derives from e, so qualify the self-join via aliases.
    m = (
        nodes.alias("n").join(e.alias("e"),
                              F.col("n.url") == F.col("e.src"), "left")
        .select(
            F.col("n.url").alias("url"),
            F.coalesce(F.col("e.dst"), F.col("n.url")).alias("cur"),
            F.when(F.col("e.dst").isNull(), F.lit(0))
            .otherwise(F.lit(1)).alias("hops"),
            F.col("e.dst").isNull().alias("done"),
        )
        .localCheckpoint(eager=True)
    )

    # the seed's done flag knows only the SOURCE's terminality (a row
    # whose cur is terminal learns it one round later, when it absorbs
    # the terminal's own done=true seed), so after r rounds done covers
    # distance 2^r - 1, not 2^r: r = ceil(log2(max_hops + 1)) rounds.
    # (Caught by the seeded fuzzer: a chain of length exactly 8 at
    # max_hops=8 was wrongly capped with ceil(log2(max_hops)) rounds.)
    rounds = max(1, math.ceil(math.log2(max_hops + 1)))
    for _ in range(rounds):
        succ = m.select(
            F.col("url").alias("s_url"), F.col("cur").alias("s_cur"),
            F.col("hops").alias("s_hops"), F.col("done").alias("s_done"),
        )
        # every cur is a known url (nodes covers dsts), so the join is
        # total; left-join keeps the invariant obvious to the optimizer.
        m = (
            m.join(succ, m["cur"] == succ["s_url"], "left")
            .select(
                m["url"],
                F.when(m["done"], m["cur"])
                .otherwise(F.col("s_cur")).alias("cur"),
                F.when(m["done"], m["hops"])
                .otherwise(m["hops"] + F.col("s_hops")).alias("hops"),
                (m["done"] | F.col("s_done")).alias("done"),
            )
            .localCheckpoint(eager=True)
        )

    resolved = F.col("done") & (F.col("hops") <= F.lit(max_hops))
    return m.select(
        "url",
        F.when(resolved, F.col("cur")).alias("final_url"),
        F.when(resolved, F.col("hops")).cast("int").alias("hops"),
        F.when(resolved, F.lit("ok")).otherwise(F.lit("capped"))
        .alias("status"),
    )
