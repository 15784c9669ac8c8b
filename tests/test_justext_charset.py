"""jusText-style line classification (X77) and charset sniffing (X76)."""

from pyspark.sql import functions as F

from ptt_spider_go_spark.htmlparse.charset import sniff_charset
from ptt_spider_go_spark.pipeline.justext import justext_lines

GOOD = "this is the main content of the page and it is written for the reader"
NEAR = "more of the same here"
NAV = "menu products pricing contact"
STUB = "ok"


def _lines(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return {r["pos"]: r.asDict() for r in justext_lines(df).collect()}


class TestJustext:
    def test_context_free_classes(self, spark):
        out = _lines(spark, "\n".join([NAV, GOOD, NEAR, STUB]))
        assert out[0]["ctx_class"] == "bad"        # no stopwords
        assert out[1]["ctx_class"] == "good"       # dense + long
        assert out[2]["ctx_class"] == "near_good"  # dense + short-ish
        assert out[3]["ctx_class"] == "short"

    def test_rescue_both_directions(self, spark):
        # near_good after good -> rescued; short before good -> rescued
        out = _lines(spark, "\n".join([GOOD, NEAR, NAV, STUB, GOOD]))
        assert out[1]["cls"] == "good" and out[1]["kept"] is True
        assert out[3]["cls"] == "good"  # lead() sees the good line
        assert out[2]["cls"] == "bad"   # bad is never rescued

    def test_edge_nulls_are_bad(self, spark):
        # near_good at both document edges with no good neighbour:
        # NULL lag/lead must fall through to 'bad', not error or keep
        out = _lines(spark, "\n".join([NEAR, NAV, NEAR]))
        assert out[0]["cls"] == "bad"
        assert out[2]["cls"] == "bad"

    def test_density_boundary_integer_exact(self, spark):
        # 10 tokens, 3 stopwords: 3*1000 >= 10*300 -> exactly dense
        at = "the is of word word word word word word word"
        below = "the is word word word word word word word word"
        out = _lines(spark, at + "\n" + below)
        assert out[0]["ctx_class"] == "good"
        assert out[1]["ctx_class"] == "bad"

    def test_counts_and_kept_flag(self, spark):
        out = _lines(spark, GOOD)
        assert out[0]["n_tok"] == 15 and out[0]["sw_cnt"] == 10
        assert out[0]["kept"] is True


class TestSniffCharset:
    def _sniff(self, spark, rows):
        df = spark.createDataFrame(
            rows, "url string, content_type string, html binary")
        return {r["url"]: (r["charset"], r["source"])
                for r in sniff_charset(df).collect()}

    def test_precedence_chain(self, spark):
        page = b"<html><body>hello</body></html>"
        meta = b'<head><meta charset="Shift_JIS"></head>' + page
        rows = [
            ("u1", "text/html", b"\xef\xbb\xbf" + page),
            ("u2", "text/html", b"\xff\xfe" + page),
            ("u3", "text/html", b"\xfe\xff" + page),
            # BOM beats an explicit (conflicting) HTTP charset
            ("u4", "text/html; charset=big5", b"\xef\xbb\xbf" + page),
            # HTTP beats meta
            ("u5", 'text/html; charset="UTF-8"', meta),
            ("u6", "text/html", meta),
            ("u7", None, page),
        ]
        out = self._sniff(spark, rows)
        assert out["u1"] == ("utf-8", "bom")
        assert out["u2"] == ("utf-16le", "bom")
        assert out["u3"] == ("utf-16be", "bom")
        assert out["u4"] == ("utf-8", "bom")
        assert out["u5"] == ("utf-8", "http")
        assert out["u6"] == ("shift_jis", "meta")
        assert out["u7"] == ("windows-1252", "default")

    def test_legacy_http_equiv_meta(self, spark):
        body = (b'<meta http-equiv="Content-Type" '
                b'content="text/html; charset=ISO-8859-2">page text')
        out = self._sniff(spark, [("u", "text/html", body)])
        assert out["u"] == ("iso-8859-2", "meta")

    def test_meta_outside_prescan_window_ignored(self, spark):
        body = b" " * 1300 + b'<meta charset="big5">'
        out = self._sniff(spark, [("u", "text/html", body)])
        assert out["u"] == ("windows-1252", "default")

    def test_high_bytes_never_error(self, spark):
        # arbitrary binary before the prescan window: ISO-8859-1 is a
        # total decoding, so garbage must classify, not throw
        body = bytes(range(256)) + b'<meta charset="utf-8">'
        out = self._sniff(spark, [("u", "text/html", body)])
        assert out["u"][0] in ("windows-1252", "utf-8")
