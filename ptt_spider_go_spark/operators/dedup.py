"""Distributed URL-seen set: partitioned Bloom shards + exact verify (D4).

[north_rule] BASELINE.json:14 mandates a "distributed URL-seen set built
from partitioned Bloom filters with a ... verification pass on probable
hits". The exactness invariant (SURVEY §7 risk 5): a Bloom hit may be a
false positive, so "probably seen" candidates are verified with an exact
left-anti join against the seen table before exclusion — the Bloom layer
only removes the (vast majority of) definitely-new URLs from the join,
turning a full |candidates| ⋈ |seen| shuffle into a small one.

Scale shape: shard bit-arrays are built distributedly (applyInPandas per
shard over only the *newly added* URLs each superstep — O(new), not
O(seen)), OR-merged driver-side (bytes, tiny), and broadcast for probing
(mapInPandas, Arrow-vectorized SipHash via pandas.util.hash_array). On
resume, shards are rebuilt from the checkpointed seen table in one
distributed pass, so Bloom state itself is never checkpointed.

The reference itself has no global seen set (each URL is produced once
per run); this operator is mandated by the north_rule.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HASH_KEY_1 = "ptt-spider-bloom-1"  # padded to 16 bytes below
_HASH_KEY_2 = "ptt-spider-bloom-2"


def _key(k: str) -> str:
    return (k * 2)[:16]


def _hash2(urls: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    arr = np.asarray(urls.astype(object))
    h1 = pd.util.hash_array(arr, hash_key=_key(_HASH_KEY_1))
    h2 = pd.util.hash_array(arr, hash_key=_key(_HASH_KEY_2))
    # Kirsch-Mitzenmacher double hashing; force h2 odd so strides cover bits.
    return h1, (h2 | np.uint64(1))


def _set_bits(bits: np.ndarray, h1, h2, k: int, m_bits: int) -> None:
    for i in range(k):
        idx = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
        np.bitwise_or.at(bits, (idx >> np.uint64(3)).astype(np.int64),
                         np.left_shift(np.uint8(1), (idx & np.uint64(7)).astype(np.uint8)))


def _test_bits(bits: np.ndarray, h1, h2, k: int, m_bits: int) -> np.ndarray:
    hit = np.ones(len(h1), dtype=bool)
    for i in range(k):
        idx = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
        byte = bits[(idx >> np.uint64(3)).astype(np.int64)]
        mask = np.left_shift(np.uint8(1), (idx & np.uint64(7)).astype(np.uint8))
        hit &= (byte & mask) != 0
    return hit


class BloomShardSet:
    """n_shards Bloom filters keyed by shard = h1(url) % n_shards."""

    def __init__(self, n_shards: int = 8, expected_per_shard: int = 1 << 17,
                 fpp: float = 0.01):
        self.n_shards = n_shards
        m = int(-expected_per_shard * math.log(fpp) / (math.log(2) ** 2))
        self.m_bits = max(1024, (m + 7) // 8 * 8)
        self.k = max(1, round(self.m_bits / expected_per_shard * math.log(2)))
        self.shards = np.zeros((n_shards, self.m_bits // 8), dtype=np.uint8)

    # -- build / merge ------------------------------------------------------

    def add_df(self, df: DataFrame, url_col: str = "url") -> None:
        """OR the URLs of `df` into the shard bit-arrays. Distributed:
        each partition reduces its rows to n_shards bitmaps; the driver
        only receives and ORs tiny byte arrays."""
        n_shards, m_bits, k = self.n_shards, self.m_bits, self.k

        def to_bitmaps(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            acc = np.zeros((n_shards, m_bits // 8), dtype=np.uint8)
            touched = np.zeros(n_shards, dtype=bool)
            for pdf in batches:
                if not len(pdf):
                    continue
                h1, h2 = _hash2(pdf[url_col])
                shard = (h1 % np.uint64(n_shards)).astype(np.int64)
                for s in np.unique(shard):
                    sel = shard == s
                    _set_bits(acc[s], h1[sel], h2[sel], k, m_bits)
                    touched[s] = True
            yield pd.DataFrame(
                {"shard": np.nonzero(touched)[0],
                 "bits": [acc[s].tobytes() for s in np.nonzero(touched)[0]]}
            )

        parts = df.select(url_col).mapInPandas(to_bitmaps, "shard int, bits binary")
        for row in parts.collect():
            self.shards[row["shard"]] |= np.frombuffer(row["bits"], dtype=np.uint8)

    # -- probe ---------------------------------------------------------------

    def with_maybe_seen(self, df: DataFrame, url_col: str = "url",
                        out_col: str = "maybe_seen") -> DataFrame:
        """Append a boolean column: True if the URL *might* be in the set
        (needs exact verification), False if definitely new."""
        spark = df.sparkSession
        bc = spark.sparkContext.broadcast(self.shards.tobytes())
        n_shards, m_bits, k = self.n_shards, self.m_bits, self.k
        cols = df.columns

        def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            flat = np.frombuffer(bc.value, dtype=np.uint8).reshape(
                n_shards, m_bits // 8
            )
            for pdf in batches:
                if not len(pdf):
                    pdf[out_col] = pd.Series([], dtype=bool)
                    yield pdf
                    continue
                h1, h2 = _hash2(pdf[url_col])
                shard = (h1 % np.uint64(n_shards)).astype(np.int64)
                hit = np.zeros(len(pdf), dtype=bool)
                for s in np.unique(shard):
                    sel = shard == s
                    hit[sel] = _test_bits(flat[s], h1[sel], h2[sel], k, m_bits)
                pdf = pdf.copy()
                pdf[out_col] = hit
                yield pdf

        from pyspark.sql.types import BooleanType, StructField, StructType

        out_schema = StructType(
            list(df.schema.fields) + [StructField(out_col, BooleanType())]
        )
        return df.mapInPandas(probe, out_schema)


def dedup_against_seen(candidates: DataFrame, seen: DataFrame | None,
                       blooms: BloomShardSet | None,
                       url_col: str = "url") -> DataFrame:
    """Exact not-seen filter (J2): Bloom prefilter then left-anti verify.

    definitely-new rows (bloom miss) bypass the join entirely; probable
    hits — bloom FPs plus true repeats — are verified exactly. Returns
    rows of `candidates` whose URL is not in `seen`.
    """
    if seen is None:
        return candidates
    if blooms is None:
        return candidates.join(seen.select(url_col), on=url_col, how="left_anti")
    probed = blooms.with_maybe_seen(candidates, url_col)
    fresh = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
    probable = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
    verified = probable.join(seen.select(url_col), on=url_col, how="left_anti")
    return fresh.unionByName(verified)
