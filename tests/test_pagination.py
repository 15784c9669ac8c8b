"""Pagination chains (X88): extraction, assembly, stitching, rollup."""

from ptt_spider_go_spark.operators.pagination import (
    next_prev_claims, pagination_series, series_rollup, stitch_series,
)


def _claims_df(spark, rows):
    return spark.createDataFrame(
        rows, "url string, next_url string, prev_url string")


def _series(spark, rows):
    return {r["url"]: r.asDict()
            for r in pagination_series(_claims_df(spark, rows)).collect()}


class TestExtraction:
    def test_spellings_and_resolution(self, spark):
        pages = spark.createDataFrame([
            ("http://s.ex/a/p1",
             '<link rel="next" href="/a/p2">'
             '<link href="http://s.ex/a/p0" rel="previous">'),
            ("http://s.ex/a/p2",
             '<link href="p3" rel=next>'
             '<link rel=prev href="//s.ex/a/p1">'),
            ("http://s.ex/a/p3", "<html>no links</html>"),
        ], "url string, html string")
        out = {r["url"]: r.asDict()
               for r in next_prev_claims(pages).collect()}
        a = out["http://s.ex/a/p1"]
        assert a["next_url"] == "http://s.ex/a/p2"   # root-relative
        assert a["prev_url"] == "http://s.ex/a/p0"   # absolute, 'previous'
        b = out["http://s.ex/a/p2"]
        assert b["next_url"] == "http://s.ex/a/p3"   # directory-relative
        assert b["prev_url"] == "http://s.ex/a/p1"   # scheme-relative
        c = out["http://s.ex/a/p3"]
        assert c["next_url"] is None and c["prev_url"] is None

    def test_bare_rel_tag_cannot_steal_next_tags_href(self, spark):
        # `<link rel=next>` has no href; the regex must not walk
        # through the '>' into the stylesheet tag (cross-tag bug)
        pages = spark.createDataFrame([
            ("http://s.ex/p",
             '<link rel=next><link rel="stylesheet" href="/s.css">'),
        ], "url string, html string")
        out = next_prev_claims(pages).collect()[0]
        assert out["next_url"] is None

    def test_canonical_twin_of_cross_tag_bug(self, spark):
        # same latent pattern fixed in htmlparse/canonical.py
        from ptt_spider_go_spark.htmlparse.canonical import (
            canonical_claims,
        )
        pages = spark.createDataFrame([
            ("http://s.ex/p",
             '<link rel=canonical><link rel="icon" href="/i.png">'),
        ], "url string, html string")
        out = canonical_claims(pages).collect()[0]
        assert out["claimed"] is False
        assert out["canonical"] == "http://s.ex/p"


class TestAssembly:
    def test_chain_positions_and_singleton(self, spark):
        out = _series(spark, [
            ("h", "m", None), ("m", "t", None), ("t", None, "m"),
            ("lone", None, None),
        ])
        assert [(out[u]["series_key"], out[u]["position"])
                for u in ("h", "m", "t")] == [("h", 0), ("h", 1), ("h", 2)]
        assert out["lone"]["series_key"] == "lone"
        assert out["lone"]["position"] == 0
        assert all(r["status"] == "ok" for r in out.values())

    def test_cycle_is_broken(self, spark):
        out = _series(spark, [
            ("a", "b", None), ("b", "c", None), ("c", "a", None),
            ("x", None, None),
        ])
        for u in "abc":
            assert out[u]["status"] == "broken"
            assert out[u]["series_key"] is None
            assert out[u]["position"] is None
        assert out["x"]["status"] == "ok"

    def test_conflicting_claimants_collapse_to_min(self, spark):
        # both 'a2' and 'rogue' declare next=z: the lexical-min
        # claimant (a2) keeps the edge; rogue heads its own series.
        out = _series(spark, [
            ("a1", "a2", None), ("a2", "z", None),
            ("rogue", "z", None), ("z", None, None),
        ])
        assert out["z"]["series_key"] == "a1"
        assert out["z"]["position"] == 2
        assert out["rogue"]["series_key"] == "rogue"
        assert out["rogue"]["position"] == 0

    def test_overlong_chain_capped(self, spark):
        n = 12
        rows = [(f"p{i:02d}", f"p{i+1:02d}" if i < n else None, None)
                for i in range(n + 1)]
        df = _claims_df(spark, rows)
        out = {r["url"]: r["status"]
               for r in pagination_series(df, max_len=4).collect()}
        assert out["p00"] == "ok"      # the head itself: position 0
        assert out["p04"] == "ok"      # exactly max_len hops
        assert out["p05"] == "broken"  # max_len+1 hops from the head
        assert out["p12"] == "broken"  # far past the cap


class TestRollup:
    def test_complete_and_sizes(self, spark):
        series = pagination_series(_claims_df(spark, [
            ("h", "m", None), ("m", "t", None), ("t", None, "m"),
            ("lone", None, None),
            ("a", "b", None), ("b", "a", None),   # broken pair
        ]))
        out = {r["series_key"]: r.asDict()
               for r in series_rollup(series).collect()}
        assert set(out) == {"h", "lone"}          # broken excluded
        assert (out["h"]["n_pages"], out["h"]["max_position"]) == (3, 2)
        assert bool(out["h"]["complete"]) is True
        assert (out["lone"]["n_pages"], out["lone"]["max_position"]) \
            == (1, 0)

    def test_stitch_orders_by_position(self, spark):
        series = pagination_series(_claims_df(spark, [
            ("h", "m", None), ("m", "t", None), ("t", None, "m"),
            ("a", "b", None), ("b", "a", None),   # broken: no stitch
        ]))
        docs = spark.createDataFrame(
            [("t", "tail"), ("h", "head"), ("m", "middle"),
             ("a", "x"), ("b", "y")],
            "url string, text string")
        out = {r["series_key"]: r.asDict()
               for r in stitch_series(docs, series).collect()}
        assert set(out) == {"h"}
        assert out["h"]["n_pages"] == 3
        assert out["h"]["text"] == "head\n\nmiddle\n\ntail"

    def test_multi_snapshot_fork_detected_as_incomplete(self, spark):
        # a union of two snapshots gives url 'f' two different next
        # claims -> the walk becomes a non-path tree with duplicate
        # depths; complete=false flags it
        series = pagination_series(_claims_df(spark, [
            ("f", "x", None), ("f", "y", None),
            ("x", None, None), ("y", None, None),
        ]))
        out = {r["series_key"]: r.asDict()
               for r in series_rollup(series).collect()}
        r = out["f"]
        assert r["n_pages"] == 3
        assert r["max_position"] == 1        # depths 0,1,1 -> gap
        assert bool(r["complete"]) is False
