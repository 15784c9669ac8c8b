"""Mojibake repair: UTF-8-read-as-cp1252 artifact reversal (X140).

Every real web corpus runs an encoding-repair pass (C4 and The Pile
run ftfy; OSCAR documents the same class of fixes): text that was
UTF-8 on the wire but decoded as Windows-1252 somewhere upstream
turns every non-ASCII char into 2–3 artifact chars ('é' -> 'Ã©',
'"' -> 'â€œ', '€' -> 'â‚¬'). The repair is deterministic string
surgery — exactly the kind of map-only, JVM-expression transform
this engine can oracle bit-exactly, unlike ftfy's full
heuristic stack (which needs real codecs; the table below is its
single most common fix, UTF-8/cp1252, covering the dominant share
of real-world mojibake).

The table is GENERATED, not hand-typed: for each repairable target
char, its mojibake form is the cp1252 decoding of its UTF-8 bytes,
computed at import (targets whose bytes hit the five cp1252 holes
are skipped). Repair applies replacements longest-artifact-first in
one deterministic chain — both engines' replace() substitutes all
occurrences per step, so the chain is order-identical in Spark and
DuckDB by construction.

Scale shape: ONE map-only projection (a chain of literal replaces
inside whole-stage codegen); no shuffle, no UDF, no Python on the
hot path.

Reference tie-in: the Go crawler emits whatever bytes PTT serves
(UTF-8 by construction, parser_impl.go); encoding repair is
pipeline-extension territory (SURVEY §2 X-table).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, functions as F

#: chars whose UTF-8/cp1252 mojibake forms this pass repairs — the
#: high-frequency European accents, German sharp s, Spanish tilde,
#: the cp1252 smart-punctuation block, ellipsis, dashes, euro,
#: guillemets. (A target is skipped automatically if any of its
#: UTF-8 bytes has no cp1252 decoding.)
TARGET_CHARS = (
    "éèêëàáâäåçìíîïñòóôöùúûüýßÉÈÀÁÂÄÇÑÖÜ"
    "‘’“”–—…€«»"
    "©®°¿¡"
)


def _build_table() -> list[tuple[str, str]]:
    out = []
    for ch in TARGET_CHARS:
        try:
            moji = ch.encode("utf-8").decode("cp1252")
        except UnicodeDecodeError:
            continue
        out.append((moji, ch))
    # longest artifact first (3-byte seqs before 2-byte), then lexical
    # — a deterministic total order shared with the SQL twin.
    out.sort(key=lambda mc: (-len(mc[0]), mc[0]))
    return out


#: (mojibake_sequence, repaired_char), application order.
REPAIR_TABLE = _build_table()


def fix_mojibake(col: Column) -> Column:
    """Repair UTF-8-as-cp1252 artifacts: one deterministic chain of
    literal replaces, longest artifact first. Map-only, codegen-able,
    NULL-propagating."""
    return reduce(
        lambda c, mc: F.replace(c, F.lit(mc[0]), F.lit(mc[1])),
        REPAIR_TABLE,
        col,
    )


def fix_mojibake_sql(expr: str) -> str:
    """DuckDB twin: the same chain as nested replace() calls, same
    order, generated from the same table."""
    for moji, ch in REPAIR_TABLE:
        m = moji.replace("'", "''")
        c = ch.replace("'", "''")
        expr = f"replace({expr}, '{m}', '{c}')"
    return expr


def corrupt(text: str) -> str:
    """Pure-Python forward corruption (clean -> mojibake) for fixtures
    and the deterministic contract demo: encode UTF-8, decode cp1252,
    keeping chars whose bytes don't round-trip unchanged."""
    out = []
    for ch in text:
        try:
            out.append(ch.encode("utf-8").decode("cp1252"))
        except UnicodeDecodeError:
            out.append(ch)
    return "".join(out)
