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
    # a host with no robots.txt server → empty table (default-allow)
    assert fetch.fetch_robots(spark, ["http://127.0.0.1:1/x"], timeout=2).count() == 0


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
