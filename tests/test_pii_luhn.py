"""X145: Luhn card-number validation (textstats.pii_luhn).

Pins: known-valid PANs (the canonical test numbers) validate and
off-by-one corruptions fail; a pure-Python Luhn mirror matches
Spark over generated candidates of every length 13-19; runs shorter
than 13 or longer than 19 digits produce no candidates (the 20-digit
run is NOT truncated into a valid prefix — the regex takes the
longest match, which fails the length gate only when the full run
does); multiple candidates per doc index in order;
partitioning-invariant.
"""

from __future__ import annotations

from ptt_spider_go_spark.pipeline.textstats import pii_luhn

SCHEMA = "doc_id long, text string"

# canonical test PANs (public checksum test vectors)
VALID = ["4111111111111111", "5500005555555559", "340000000000009",
         "6011000000000004", "4222222222222"]


def _docs(spark, rows, parts=4):
    return spark.createDataFrame(rows, schema=SCHEMA).repartition(parts)


def _luhn(s: str) -> bool:
    total = 0
    for i, ch in enumerate(reversed(s)):
        d = ord(ch) - 48
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


def _collect(spark, rows):
    out = {}
    for r in pii_luhn(_docs(spark, rows)).collect():
        out.setdefault(r["doc_id"], []).append(
            (r["cand_idx"], r["n_digits"], r["luhn_valid"])
        )
    return {k: sorted(v) for k, v in out.items()}


def test_canonical_pans_validate(spark):
    rows = [(i, f"pay with {v} today") for i, v in enumerate(VALID)]
    rows += [(100 + i, f"bad {v[:-1]}{(int(v[-1]) + 1) % 10} here")
             for i, v in enumerate(VALID)]
    got = _collect(spark, rows)
    for i, v in enumerate(VALID):
        assert got[i] == [(0, len(v), True)]
        assert got[100 + i] == [(0, len(v), False)]


def test_matches_mirror_all_lengths(spark):
    rows = []
    for n in range(13, 20):
        for k in range(5):
            digits = "".join(
                str((n * 7 + k * 13 + j * 31) % 10) for j in range(n)
            )
            rows.append((n * 100 + k, f"x {digits} y"))
    got = _collect(spark, rows)
    for d, t in rows:
        digits = t.split()[1]
        assert got[d] == [(0, len(digits), _luhn(digits))]


def test_length_gate(spark):
    rows = [
        (1, "short 123456789012 run"),          # 12 digits: no match
        (2, "long 123456789012345678901 run"),  # 21 digits: no match
        (3, "no digits at all"),
    ]
    got = _collect(spark, rows)
    assert got == {}


def test_multiple_candidates_index_in_order(spark):
    rows = [(1, f"a {VALID[0]} b {VALID[1]} c 1234567890123 d")]
    got = _collect(spark, rows)
    assert [c for c, _n, _v in got[1]] == [0, 1, 2]
    assert got[1][0][2] is True and got[1][1][2] is True
    assert got[1][2] == (2, 13, _luhn("1234567890123"))


def test_partitioning_invariance(spark):
    rows = [(i, f"t {VALID[i % len(VALID)]} s") for i in range(20)]
    ra = sorted(tuple(r) for r in
                pii_luhn(_docs(spark, rows, 2)).collect())
    rb = sorted(tuple(r) for r in
                pii_luhn(_docs(spark, rows, 7)).collect())
    assert ra == rb
