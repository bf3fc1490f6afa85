"""Live HTTP fetch stage: fetch_batch semantics against a loopback
server, and a REAL end-to-end crawl — CrawlFrontier + make_expand_fn
fetching, extracting, and scheduling an actual (local) website."""

import threading
from http.server import SimpleHTTPRequestHandler, ThreadingHTTPServer

import pytest

from ccspark import fetch


class _QuietHandler(SimpleHTTPRequestHandler):
    def log_message(self, *args):  # noqa: D102 — silence request logging
        pass


@pytest.fixture(scope="module")
def site(tmp_path_factory):
    """A tiny interlinked site served on 127.0.0.1:<ephemeral>."""
    root = tmp_path_factory.mktemp("site")
    (root / "index.html").write_text(
        '<html><body><a href="/p1.html">one</a>'
        "<a href='p2.html'>two</a>"
        '<a href="#frag">skip</a><a href="javascript:void(0)">skip</a>'
        "</body></html>"
    )
    (root / "p1.html").write_text(
        '<html><a href="/sub/p3.html">three</a>'
        '<a href="http://127.0.0.1:1/external">dead</a></html>'
    )
    (root / "p2.html").write_text(
        '<html><a href="sub/p3.html">three</a>'
        '<a href="/private/secret.html">nope</a></html>'
    )
    priv = root / "private"
    priv.mkdir()
    (priv / "secret.html").write_text("<html>should never be scheduled</html>")
    (root / "robots.txt").write_text(
        "User-agent: *\nDisallow: /private/\nCrawl-delay: 1\n"
    )
    sub = root / "sub"
    sub.mkdir()
    (sub / "p3.html").write_text("<html>leaf — no links</html>")
    (root / "big.html").write_text("<html>" + "x" * 100_000 + "</html>")
    # /r redirects to /r/ (directory 301): relative links inside must
    # resolve against the REDIRECTED base
    rdir = root / "r"
    rdir.mkdir()
    (rdir / "index.html").write_text('<html><a href="next.html">n</a></html>')
    (rdir / "next.html").write_text("<html>leaf</html>")

    handler = lambda *a, **kw: _QuietHandler(*a, directory=str(root), **kw)  # noqa: E731
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_fetch_batch_statuses_and_caps(site):
    import pandas as pd

    urls = pd.Series(
        [
            f"{site}/index.html",
            f"{site}/missing.html",
            f"{site}/big.html",
            "http://127.0.0.1:1/refused",
        ]
    )
    out = fetch.fetch_batch(urls, timeout=5, max_bytes=1000)
    assert out["status"].tolist()[:3] == [200, 404, 200]
    assert pd.isna(out["status"][3])
    assert "text/html" in out["content_type"][0]
    assert b"p1.html" in out["html"][0]
    assert len(out["html"][2]) == 1000 and out["fetch_err"][2] == "truncated"
    assert out["fetch_err"][3] and "Error" in out["fetch_err"][3]


def test_fetch_pages_dataframe(spark, site):
    df = spark.createDataFrame(
        [(f"{site}/index.html", 1.0), (f"{site}/missing.html", 0.5)],
        "url string, priority double",
    )
    got = fetch.fetch_pages(df, timeout=5).orderBy("url").collect()
    by_status = {r["status"] for r in got}
    assert by_status == {200, 404}
    assert all("priority" in r.asDict() for r in got)  # input columns carried


def test_fetch_robots_parses_live_rules(spark, site):
    rules = fetch.fetch_robots(spark, [f"{site}/index.html"], timeout=5).collect()
    assert len(rules) == 1
    r = rules[0]
    assert r["host"] == "127.0.0.1"
    assert r["disallow_prefixes"] == ["/private/"]
    assert r["crawl_delay_ms"] == 1000
    # an UNREACHABLE robots server (connection refused) → RFC 9309
    # §2.3.1.4: complete disallow, not default-allow
    rows = fetch.fetch_robots(spark, ["http://127.0.0.1:1/x"], timeout=2).collect()
    assert len(rows) == 1
    assert rows[0]["host"] == "127.0.0.1" and rows[0]["disallow_prefixes"] == ["/"]


def test_fetch_robots_https_first_falls_back_to_http(spark, site):
    """A bare host tries https first; the (http-only) loopback server
    fails the TLS handshake → transport error → http fallback parses
    the real rules (an https-only host's rules are no longer missed,
    and an http-only host still works)."""
    netloc = site.split("://", 1)[1]
    rules = fetch.fetch_robots(spark, [netloc], timeout=5).collect()
    assert len(rules) == 1
    assert rules[0]["disallow_prefixes"] == ["/private/"]
    assert rules[0]["crawl_delay_ms"] == 1000


@pytest.fixture(scope="module")
def robots_503_site():
    class _Err(SimpleHTTPRequestHandler):
        def do_GET(self):
            self.send_error(503)

        def log_message(self, *args):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Err)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_fetch_robots_5xx_is_complete_disallow(spark, robots_503_site):
    rows = fetch.fetch_robots(spark, [f"{robots_503_site}/x"], timeout=5).collect()
    assert len(rows) == 1 and rows[0]["disallow_prefixes"] == ["/"]


def test_redirected_page_links_resolve_against_final_url(spark, site):
    """urllib follows /r → /r/ (301); relative hrefs must resolve
    against the landed URL (final_url), not the scheduled one."""
    expand = fetch.make_expand_fn(timeout=5)
    sched = spark.createDataFrame([(f"{site}/r", 1.0)], "url string, priority double")
    got = {r["url"] for r in expand(sched).collect()}
    assert f"{site}/r/next.html" in got
    assert f"{site}/next.html" not in got


def test_live_crawl_respects_live_robots(spark, site, tmp_path):
    """End-to-end: the crawl fetches the site's real robots.txt and the
    politeness gate retires /private/ URLs instead of scheduling them."""
    from ccspark.frontier import CrawlFrontier, FrontierConfig

    fr = CrawlFrontier(
        spark,
        str(tmp_path / "ckpt"),
        FrontierConfig(num_partitions=4, universe_n=1000, n_hosts=10, default_budget=10, n_salts=2),
        expand_fn=fetch.make_expand_fn(timeout=5),
        robots_df=fetch.fetch_robots(spark, [f"{site}/index.html"], timeout=5),
    )
    seeds = spark.createDataFrame([(f"{site}/index.html", 1.0)], "url string, priority double")
    metrics = fr.run(seeds, 4)
    scheduled = {r["canonical_url"] for r in fr.read_trace(len(metrics)).collect()}
    assert not any("/private/" in u for u in scheduled)
    assert any(u.endswith("/p2.html") for u in scheduled)
    # the disallowed URL was DISCOVERED and retired (in seen, not scheduled)
    seen_n = fr.read_seen(len(metrics)).count()
    assert seen_n == len(scheduled) + 1


def test_live_crawl_end_to_end(spark, site, tmp_path):
    """The frontier crawls the real site: fetch → href extraction →
    RFC 3986 resolution → canonical identity → politeness →
    next round.  Dead external links become fetch errors (data), the
    frontier drains when the site is exhausted."""
    from ccspark import synth
    from ccspark.frontier import CrawlFrontier, FrontierConfig

    cfg = FrontierConfig(
        num_partitions=4,
        universe_n=1000,
        n_hosts=10,
        default_budget=10,
        n_salts=2,
    )
    fr = CrawlFrontier(
        spark,
        str(tmp_path / "ckpt"),
        cfg,
        expand_fn=fetch.make_expand_fn(timeout=5),
    )
    seeds = spark.createDataFrame([(f"{site}/index.html", 1.0)], "url string, priority double")
    metrics = fr.run(seeds, 4)

    trace = {
        (r["round"], r["canonical_url"]) for r in fr.read_trace(len(metrics)).collect()
    }
    by_round = {}
    for rnd, url in trace:
        by_round.setdefault(rnd, set()).add(url.rsplit("/", 1)[-1] or url)
    assert by_round[1] == {"index.html"}
    assert by_round[2] == {"p1.html", "p2.html"}
    # round 3: the leaf, the dead external link (scheduled; fetch fails
    # as data), and /private/secret.html — NO robots table was given, so
    # nothing retires it (test_live_crawl_respects_live_robots is the
    # robots-enforced counterpart)
    assert {u.rsplit("/", 1)[-1] for u in by_round[3]} == {
        "p3.html",
        "external",
        "secret.html",
    }
    # drained: no round 4 schedules anything
    assert 4 not in by_round
    assert metrics[-1]["frontier_size"] == 0


def test_fetch_batch_per_host_spacing(site):
    """Same-host requests are spaced max(delay_ms, crawl_delay_ms)
    apart; different hosts don't wait on each other."""
    import time

    import pandas as pd

    urls = pd.Series([f"{site}/index.html"] * 3)
    t0 = time.monotonic()
    out = fetch.fetch_batch(
        urls, timeout=5, hosts=["h1", "h1", "h1"], delays_ms=[250, 250, 250]
    )
    elapsed = time.monotonic() - t0
    assert out["status"].tolist() == [200, 200, 200]
    assert elapsed >= 0.5  # two inter-request gaps of >= 250ms

    # NaN delay (no robots Crawl-delay) + no hosts → no spacing semantics change
    out2 = fetch.fetch_batch(
        urls, timeout=5, hosts=["h1", "h2", "h3"], delays_ms=[None, None, 500]
    )
    assert out2["status"].tolist() == [200, 200, 200]


@pytest.fixture(scope="module")
def robots_redirect_loop_site():
    class _Loop(SimpleHTTPRequestHandler):
        def do_GET(self):
            self.send_response(302)
            self.send_header("Location", "/robots.txt")
            self.end_headers()

        def log_message(self, *args):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Loop)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_fetch_robots_redirect_loop_is_unavailable_allow(spark, robots_redirect_loop_site):
    """RFC 9309 §2.3.1.2: ≥5 redirects → MAY assume unavailable;
    §2.3.1.3: unavailable → allow.  A redirect-looping robots.txt must
    NOT emit a disallow-all row (that would permanently retire the
    host)."""
    rows = fetch.fetch_robots(spark, [f"{robots_redirect_loop_site}/x"], timeout=5).collect()
    assert rows == []


def test_fetch_batch_spacing_survives_batch_seams(site):
    """Per-host crawl-delay must hold across Arrow batch boundaries:
    fetch_pages passes one last_at dict per task, so the last request
    of batch N and the first of batch N+1 to the same host are still
    spaced."""
    import pandas as pd

    url = f"{site}/index.html"
    host = ["127.0.0.1"]
    shared: dict = {}
    fetch.fetch_batch(pd.Series([url]), timeout=5, hosts=host, delays_ms=[300], last_at=shared)
    prev_stamp = shared["127.0.0.1"]
    fetch.fetch_batch(pd.Series([url]), timeout=5, hosts=host, delays_ms=[300], last_at=shared)
    # assert on the recorded request-START stamps, not wall clock around
    # the calls — request latency under load cannot flake this
    assert shared["127.0.0.1"] - prev_stamp >= 0.3
    # and WITHOUT the shared dict the second call does not wait on the
    # first call's stamp (fresh state per call — the old behavior)
    fresh: dict = {}
    fetch.fetch_batch(pd.Series([url]), timeout=5, hosts=host, delays_ms=[300], last_at=fresh)
    assert fresh["127.0.0.1"] > shared["127.0.0.1"]  # its own stamp only
    assert fresh["127.0.0.1"] - shared["127.0.0.1"] < 10  # sanity
