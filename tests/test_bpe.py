"""BPE-style merge training (pipeline/bpe.py): hand-traced rounds,
greedy non-overlap fold, tie-breaks, and degenerate corpora.
(Spark-vs-DuckDB parity is additionally enforced on `bpe_phrases` /
`bpe_merge_table` by the driver contract / tools/check_contract.py.)
"""

from ptt_spider_go_spark.pipeline import bpe


def _run(spark, texts, n=3):
    docs = spark.createDataFrame(
        [(i, t, "en") for i, t in enumerate(texts)],
        "doc_id long, text string, lang string",
    )
    table, applied = bpe.phrase_merges(docs, n_merges=n)
    rows = sorted(
        (r["step"], r["lhs"], r["rhs"], r["pair_count"])
        for r in table.collect()
    )
    out = {
        r["doc_id"]: list(r["syms"]) for r in applied.collect()
    }
    return rows, out


def test_three_hand_traced_rounds(spark):
    rows, out = _run(spark, ["a b a b c", "a b x"])
    assert rows == [
        (1, "a", "b", 3),          # (a,b) dominates
        (2, "a+b", "a+b", 1),      # count tie -> lexicographic pair
        (3, "a+b", "x", 1),        # 'a+b' < 'a+b+a+b' on lhs
    ]
    assert out[0] == ["a+b+a+b", "c"]
    assert out[1] == ["a+b+x"]


def test_greedy_non_overlapping_fold(spark):
    """'a a a' under merge (a,a): left-to-right non-overlap gives
    ['a+a', 'a'], then one more round chains to 'a+a+a' and the corpus
    runs dry (merge table stops early)."""
    rows, out = _run(spark, ["a a a"])
    assert rows == [(1, "a", "a", 2), (2, "a+a", "a", 1)]
    assert out[0] == ["a+a+a"]


def test_empty_and_single_token_docs(spark):
    rows, out = _run(spark, ["", "solo", "x y", "x y"])
    assert rows[0] == (1, "x", "y", 2)
    assert out[0] == [] and out[1] == ["solo"]
    assert out[2] == ["x+y"] and out[3] == ["x+y"]


def test_boundary_safety_of_fold(spark):
    """A symbol that merely ENDS with the merge's lhs must not merge:
    under merge (b,a), the symbol 'ba' followed by 'b' stays intact —
    the accumulator's space-boundary check defeats suffix collisions."""
    rows, out = _run(spark, ["b a b a", "ba b a b"], n=1)
    assert rows == [(1, "b", "a", 3)]
    assert out[0] == ["b+a", "b+a"]
    assert out[1] == ["ba", "b+a", "b"]


def test_round_lineage_truncated_and_walltime_flat(spark):
    """VERDICT r04 #1/#3: each round localCheckpoints the fold, so

    (a) the returned corpus' plan is a materialized-RDD scan — NOT the
        composition of 10 nested fold expressions (zero `aggregate(`
        in the optimized plan), and
    (b) per-round wall time stays flat in the round index: without the
        checkpoint, round k's argmax re-evaluates k prior folds
        (O(R^2) total) and the tail rounds are several times slower
        than the head rounds.
    """
    texts = [" ".join(f"t{(i * 7 + j) % 23}" for j in range(40))
             for i in range(60)]
    docs = spark.createDataFrame(
        [(i, t, "en") for i, t in enumerate(texts)],
        "doc_id long, text string, lang string",
    )
    walls: list = []
    table, applied = bpe.phrase_merges(docs, n_merges=10, round_walls=walls)
    assert table.count() == 10 and len(walls) == 10

    plan = applied._jdf.queryExecution().optimizedPlan().toString()
    assert "aggregate(" not in plan  # lineage ends at the checkpoint
    assert "ExistingRDD" in plan or "LogicalRDD" in plan

    # generous flatness bound: quadratic lineage regrowth puts the last
    # rounds ~5-10x over the first; JVM warm-up only helps the tail.
    head = sum(walls[:3]) / 3
    tail = sum(walls[-3:]) / 3
    assert tail < 4 * head, walls


def test_classifier_calibration_counts(spark):
    """Confusion counts partition the corpus at every threshold and
    monotonicity holds: raising the threshold can only shrink tp+fp."""
    from ptt_spider_go_spark.pipeline import textstats

    docs = spark.createDataFrame(
        [(i, f"word{i} " * (5 + i), "en") for i in range(12)],
        "doc_id long, text string, lang string",
    )
    rows = textstats.classifier_calibration(docs).collect()
    assert len(rows) == 5
    kept = {}
    for r in rows:
        assert r["tp"] + r["fp"] + r["fn"] + r["tn"] == 12
        kept[r["threshold"]] = r["tp"] + r["fp"]
        if r["tp"] + r["fp"] > 0:
            assert r["precision"] is not None
    ths = sorted(kept)
    assert all(kept[a] >= kept[b] for a, b in zip(ths, ths[1:]))
