"""X115: priority sampling for unbiased subset-sum estimation
(Duffield, Lund & Thorup, JACM 2007). Pins: unsaturated -> exact;
saturated sample/threshold/estimates match a pure-Python mirror of the
published scheme bit-exactly; the weight bias does its job (a tiny
sample still recovers a heavy stratum's mass where uniform sampling
would need luck)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from ptt_spider_go_spark.pipeline.textstats import (
    PRIORITY_SAMPLE_SEED,
    priority_sample_mass,
)

HASH_SPACE = float(1 << 60)


def _docs(spark, rows):
    """rows: list of (doc_id, lang, n_chars) -> documents-shaped df."""
    return spark.createDataFrame(
        [(d, lang, "x" * n) for d, lang, n in rows],
        "doc_id long, lang string, text string",
    )


def _mirror(rows, k, tolerance_ppm=300_000):
    """Pure-Python priority sampling, same hash family."""
    pr = []
    for d, lang, w in rows:
        h = int(
            hashlib.md5(f"{PRIORITY_SAMPLE_SEED}:{d}".encode())
            .hexdigest()[:15],
            16,
        )
        pr.append((d, lang, w, (float(w) * HASH_SPACE) / float(h + 1)))
    pr.sort(key=lambda t: (-t[3], t[0]))
    tau = pr[k][3] if len(pr) > k else 0.0
    tau_int = int(tau // 1)
    est: dict[str, int] = {}
    for d, lang, w, _q in pr[:k]:
        est[lang] = est.get(lang, 0) + max(w, tau_int)
    exact: dict[str, int] = {}
    for d, lang, w in rows:
        exact[lang] = exact.get(lang, 0) + w
    return {
        lang: (
            exact[lang],
            est.get(lang, 0),
            abs(est.get(lang, 0) - exact[lang]) * 1_000_000
            <= tolerance_ppm * exact[lang],
        )
        for lang in exact
    }


def test_unsaturated_sample_is_exact(spark):
    rows = [(i, "en" if i % 2 else "zh", 10 + i) for i in range(60)]
    out = {
        r["lang"]: r
        for r in priority_sample_mass(_docs(spark, rows)).collect()
    }
    for lang in ("en", "zh"):
        assert out[lang]["exact_mass"] == out[lang]["est_mass"]
        assert out[lang]["est_ok"]


def test_saturated_matches_pure_python_mirror(spark):
    rows = [
        (i, ["en", "zh", "de"][i % 3], 20 + (i * 37) % 400)
        for i in range(400)
    ]
    got = {
        r["lang"]: (r["exact_mass"], r["est_mass"], r["est_ok"])
        for r in priority_sample_mass(_docs(spark, rows), k=64).collect()
    }
    assert got == _mirror(rows, k=64)


def test_weight_bias_recovers_heavy_stratum_from_tiny_sample(spark):
    """10 heavy docs carry ~96% of the mass; k=20 of 410. Priority
    sampling's weight bias pulls the heavy docs in, so the heavy
    stratum's mass estimate lands inside the default tolerance —
    verified against the mirror (deterministic) and the flag."""
    rows = [(i, "heavy", 10_000) for i in range(10)] + [
        (100 + i, "light", 10) for i in range(400)
    ]
    out = {
        r["lang"]: r
        for r in priority_sample_mass(_docs(spark, rows), k=20).collect()
    }
    mirror = _mirror(rows, k=20)
    for lang in ("heavy", "light"):
        assert (
            out[lang]["exact_mass"],
            out[lang]["est_mass"],
            out[lang]["est_ok"],
        ) == mirror[lang]
    assert out["heavy"]["est_ok"]
    assert (
        abs(out["heavy"]["est_mass"] - 100_000) * 10 <= 100_000
    )  # within 10% despite sampling 20 of 410 docs
