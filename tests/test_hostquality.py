"""Host-level quality gate (X82)."""

from ptt_spider_go_spark.operators.hostquality import host_quality_panel


def _panel(spark, rows):
    df = spark.createDataFrame(rows, "url string, status int, text string")
    return {r["host"]: r.asDict() for r in host_quality_panel(df).collect()}


def _host(name, pages):
    return [(f"http://{name}/p{i}", s, t) for i, (s, t) in enumerate(pages)]


LONG = "genuine page content with plenty of words " * 5  # 215 chars


class TestHostQualityPanel:
    def test_keep_host(self, spark):
        out = _panel(spark, _host(
            "good.example", [(200, LONG + str(i)) for i in range(10)]))
        g = out["good.example"]
        assert g["verdict"] == "keep"
        assert g["soft404_ppm"] == 0 and g["dup_ppm"] == 0
        assert g["n_pages"] == g["n_200"] == 10

    def test_drop_soft404_host(self, spark):
        # 4/10 pages are 200-status "not found" stubs -> 400000 ppm
        pages = [(200, LONG + str(i)) for i in range(6)]
        pages += [(200, f"Error 404 — page not found ({i})")
                  for i in range(4)]
        out = _panel(spark, _host("broken.example", pages))
        b = out["broken.example"]
        assert b["soft404_ppm"] == 400_000
        assert b["verdict"] == "drop"

    def test_drop_duplicate_mirror_host(self, spark):
        # 8 identical bodies + 2 distinct: 10 pages, 3 hashes
        pages = [(200, LONG + "mirrored")] * 8
        pages += [(200, LONG + "a"), (200, LONG + "b")]
        out = _panel(spark, _host("mirror.example", pages))
        m = out["mirror.example"]
        assert m["dup_ppm"] == 700_000  # (10-3)/10
        assert m["verdict"] == "drop"

    def test_review_band(self, spark):
        # 3/20 duplicated + 3/20 soft: 150000 soft ppm, within review
        pages = [(200, LONG + str(i)) for i in range(14)]
        pages += [(200, LONG + "dup body")] * 3  # long: dup, not tiny
        pages += [(200, f"this page does not exist {i}") for i in range(3)]
        out = _panel(spark, _host("meh.example", pages))
        r = out["meh.example"]
        assert r["verdict"] == "review"

    def test_no_200s_is_drop(self, spark):
        out = _panel(spark, _host(
            "dead.example", [(404, "gone"), (500, "err")]))
        d = out["dead.example"]
        assert d["verdict"] == "drop"
        assert d["n_200"] == 0
        assert d["soft404_ppm"] is None and d["avg_chars"] is None

    def test_hosts_do_not_leak(self, spark):
        rows = _host("a.example", [(200, LONG + str(i)) for i in range(5)])
        rows += _host("b.example", [(200, "same")] * 5)
        out = _panel(spark, rows)
        assert out["a.example"]["verdict"] == "keep"
        assert out["b.example"]["dup_ppm"] == 800_000
        assert out["b.example"]["verdict"] == "drop"
