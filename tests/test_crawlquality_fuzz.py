"""Seeded-random parity fuzzers for the r5 crawl-quality operators.

Same strategy as test_property_parity.py: one Spark job per operator
over a few hundred seeded-random inputs, checked against an
independent pure-Python reference implementation — not against the
operator's own SQL oracle, so a shared misunderstanding cannot hide.
"""

import random
import re

from ptt_spider_go_spark.htmlparse.canonical import canonical_claims
from ptt_spider_go_spark.operators.dust import dust_params
from ptt_spider_go_spark.operators.redirects import resolve_redirects
from ptt_spider_go_spark.pipeline.justext import (
    JUSTEXT_STOPWORDS, justext_lines,
)

SEED = 20260818


class TestResolveRedirectsFuzz:
    def _py_resolve(self, succ, max_hops):
        nodes = set(succ) | set(succ.values())
        out = {}
        for u in sorted(nodes):
            cur, hops, ok = u, 0, False
            while hops <= max_hops:
                if cur not in succ:
                    ok = True
                    break
                cur = succ[cur]
                hops += 1
            out[u] = (cur, hops, "ok") if ok else (None, None, "capped")
        return out

    def test_random_functional_graphs(self, spark):
        rng = random.Random(SEED)
        for trial, (n, max_hops) in enumerate(
                [(60, 6), (200, 8), (120, 3), (80, 1)]):
            succ = {}
            for i in range(n):
                if rng.random() < 0.8:  # 20% terminals
                    succ[f"u{trial}_{i}"] = \
                        f"u{trial}_{rng.randrange(n)}"
            if not succ:
                continue
            got = {
                r["url"]: (r["final_url"], r["hops"], r["status"])
                for r in resolve_redirects(
                    spark.createDataFrame(
                        sorted(succ.items()), "src string, dst string"),
                    max_hops=max_hops,
                ).collect()
            }
            want = self._py_resolve(succ, max_hops)
            assert got == want, f"trial {trial}"


class TestJustextFuzz:
    def _py_classify(self, text, low=3, high=8, milli=300):
        sw = set(JUSTEXT_STOPWORDS)
        rows = []
        for pos, line in enumerate(text.split("\n")):
            toks = [t for t in re.split(r"\s+", line.strip()) if t]
            n = len(toks)
            s = sum(1 for t in (x.lower() for x in toks) if t in sw)
            if n < low:
                c = "short"
            elif s * 1000 >= n * milli:
                c = "good" if n >= high else "near_good"
            else:
                c = "bad"
            rows.append([pos, line, n, s, c])
        for i, r in enumerate(rows):
            c = r[4]
            if c in ("good", "bad"):
                final = c
            else:
                nb = [rows[j][4] for j in (i - 1, i + 1)
                      if 0 <= j < len(rows)]
                final = "good" if "good" in nb else "bad"
            r.append(final)
        return {r[0]: tuple(r[1:]) for r in rows}

    def test_random_documents(self, spark):
        rng = random.Random(SEED)
        vocab = list(JUSTEXT_STOPWORDS) + [
            "word", "content", "menu", "click", "Banana", "x9", "",
        ]
        docs = []
        for d in range(80):
            lines = [
                " ".join(rng.choice(vocab)
                         for _ in range(rng.randrange(0, 14)))
                for _ in range(rng.randrange(1, 9))
            ]
            docs.append((d, "\n".join(lines)))
        got = {}
        for r in justext_lines(spark.createDataFrame(
                docs, "doc_id long, text string")).collect():
            got.setdefault(r["doc_id"], {})[r["pos"]] = (
                r["line"], r["n_tok"], r["sw_cnt"], r["ctx_class"],
                r["cls"],
            )
        for d, text in docs:
            want = self._py_classify(text)
            assert got[d] == {p: v[:5] for p, v in want.items()}, \
                f"doc {d}"


class TestDustFuzz:
    def _py_dust(self, pages, min_support=2):
        rows = {}
        for url, h in pages:
            host = url.split("://", 1)[1].split("/", 1)[0]
            path, _, q = url.partition("?")
            params = {kv.split("=", 1)[0]
                      for kv in q.split("&") if kv.split("=", 1)[0]}
            rows[url] = (host, path, h, params)
        groups = {}
        for url, (host, path, h, params) in rows.items():
            groups.setdefault((host, path, h), []).append(params)
        support = {}
        for (host, _p, _h), members in groups.items():
            n = len(members)
            if n < 2:
                continue
            for param in set().union(*members):
                w = sum(1 for m in members if param in m)
                if 0 < w < n:
                    k = (host, param)
                    support[k] = support.get(k, 0) + 1
        return {k: v for k, v in support.items() if v >= min_support}

    def test_random_url_populations(self, spark):
        rng = random.Random(SEED)
        pages = set()
        for _ in range(400):
            host = rng.choice(["a.example", "b.example"])
            path = f"http://{host}/p{rng.randrange(6)}"
            params = rng.sample(["sid", "page", "utm", "ref"],
                                rng.randrange(0, 3))
            q = "&".join(f"{p}={rng.randrange(3)}" for p in params)
            url = path + ("?" + q if q else "")
            # content depends on path and the page param only
            page_v = next((kv.split("=")[1] for kv in q.split("&")
                           if kv.startswith("page=")), "")
            pages.add((url, f"h-{path}-{page_v}"))
        got = {
            (r["host"], r["param"]): r["support"]
            for r in dust_params(
                spark.createDataFrame(sorted(pages),
                                      "url string, content_hash string"),
                min_support=1,
            ).collect()
        }
        assert got == self._py_dust(sorted(pages), min_support=1)


class TestHostPanelFuzz:
    def _py_panel(self, pages):
        import hashlib

        from ptt_spider_go_spark.operators.soft404 import SOFT404_PHRASES
        hosts = {}
        for url, status, text in pages:
            host = url.split("://", 1)[1].split("/", 1)[0]
            hosts.setdefault(host, []).append((status, text))
        out = {}
        for host, rows in hosts.items():
            n_pages = len(rows)
            ok = [(s, t) for s, t in rows if s == 200]
            n200 = len(ok)
            if n200 == 0:
                out[host] = (n_pages, 0, None, None, None, "drop")
                continue
            total = sum(len(t) for _, t in ok)
            nsoft = sum(
                1 for _, t in ok
                if any(p in t.lower() for p in SOFT404_PHRASES)
                or 5 * len(t) * n200 < total)
            ndist = len({hashlib.md5(t.encode()).hexdigest()
                         for _, t in ok})
            sppm = nsoft * 1_000_000 // n200
            dppm = (n200 - ndist) * 1_000_000 // n200
            if sppm > 200_000 or dppm > 500_000:
                v = "drop"
            elif sppm > 100_000 or dppm > 250_000:
                v = "review"
            else:
                v = "keep"
            out[host] = (n_pages, n200, sppm, dppm, total // n200, v)
        return out

    def test_random_host_populations(self, spark):
        from ptt_spider_go_spark.operators.hostquality import (
            host_quality_panel,
        )
        rng = random.Random(SEED)
        bodies = ["long genuine body " * 9, "short", "gone",
                  "Error 404 page not found", "mirrored body " * 6]
        pages = []
        for i in range(500):
            host = f"h{rng.randrange(12)}.example"
            status = rng.choice([200] * 8 + [404, 500])
            body = rng.choice(bodies)
            if rng.random() < 0.5:  # half the bodies unique
                body += f" #{i}"
            pages.append((f"http://{host}/p{i}", status, body))
        got = {
            r["host"]: (r["n_pages"], r["n_200"], r["soft404_ppm"],
                        r["dup_ppm"], r["avg_chars"], r["verdict"])
            for r in host_quality_panel(spark.createDataFrame(
                pages, "url string, status int, text string")).collect()
        }
        assert got == self._py_panel(pages)


class TestCanonicalFuzz:
    _R1 = re.compile(
        r'(?i)<link[^>]*rel\s*=\s*["\']?canonical["\'\s>][^>]*'
        r'href\s*=\s*["\']([^"\']+)')
    _R2 = re.compile(
        r'(?i)<link[^>]*href\s*=\s*["\']([^"\']+)["\'][^>]*'
        r'rel\s*=\s*["\']?canonical')

    def _py_resolve(self, url, html):
        m = self._R1.search(html) or self._R2.search(html)
        if not m or not m.group(1):
            return url
        href = m.group(1)
        if re.match(r"^https?://", href):
            return href
        if href.startswith("//"):
            return url.split(":", 1)[0] + ":" + href
        origin_m = re.match(r"^(https?://[^/]+)", url)
        if href.startswith("/"):
            return origin_m.group(1) + href
        if re.match(r"^https?://[^/]+/", url):
            return re.sub(r"[^/]*$", "", url) + href
        return url + "/" + href

    def test_random_pages(self, spark):
        rng = random.Random(SEED)
        hrefs = ["http://c.example/t", "//c.example/t", "/t", "t",
                 "sub/t"]
        templates = [
            '<link rel="canonical" href="{h}">',
            "<link href='{h}' rel='canonical'>",
            "<LINK REL=canonical HREF=\"{h}\">",
            "<p>no claim at all</p>",
        ]
        rows = []
        for i in range(160):
            url = rng.choice([f"http://s.example/d/p{i}",
                              f"http://s.example/p{i}",
                              "http://s.example"])
            html = ("<html><head>"
                    + rng.choice(templates).format(h=rng.choice(hrefs))
                    + "</head></html>")
            rows.append((url + f"?v={i}", html))
        got = {r["url"]: r["canonical"]
               for r in canonical_claims(spark.createDataFrame(
                   rows, "url string, html string")).collect()}
        for url, html in rows:
            assert got[url] == self._py_resolve(url, html), url
