"""robots.txt parsing and rules-table construction."""

import pandas as pd

from ccspark import politeness

ROBOTS = """# example
User-agent: *
Disallow: /private
Disallow: /tmp/
Crawl-delay: 2

User-agent: ccspark
Disallow: /only-for-us
Crawl-delay: 0.5
"""


def test_parse_robots_default_agent():
    dis, delay = politeness.parse_robots_txt(ROBOTS, "*")
    assert dis == ["/private", "/tmp/"]
    assert delay == 2000


def test_parse_robots_specific_agent_wins():
    dis, delay = politeness.parse_robots_txt(ROBOTS, "ccspark")
    assert dis == ["/only-for-us"]
    assert delay == 500


def test_parse_robots_edge_cases():
    assert politeness.parse_robots_txt(None) == ([], None)
    assert politeness.parse_robots_txt("") == ([], None)
    assert politeness.parse_robots_txt("User-agent: *\nDisallow:") == ([], None)
    assert politeness.parse_robots_txt("garbage without colons\n???") == ([], None)
    # grouped user-agents share rules
    dis, _ = politeness.parse_robots_txt("User-agent: a\nUser-agent: b\nDisallow: /x", "b")
    assert dis == ["/x"]


def test_robots_table_from_fetches(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "host": ["a.com", "b.com", "c.com"],
                "robots_txt": [ROBOTS, "User-agent: *\nDisallow: /q\n", None],
            }
        )
    )
    out = politeness.robots_table_from_fetches(df).toPandas().set_index("host")
    assert list(out.loc["a.com", "disallow_prefixes"]) == ["/private", "/tmp/"]
    assert out.loc["a.com", "crawl_delay_ms"] == 2000
    assert list(out.loc["b.com", "disallow_prefixes"]) == ["/q"]
    assert pd.isna(out.loc["b.com", "crawl_delay_ms"])
    assert list(out.loc["c.com", "disallow_prefixes"]) == []


# ---------------------------------------------------------------------------
# RFC 9309 rules: Allow + '*'/'$' patterns, longest-match precedence
# ---------------------------------------------------------------------------

RFC_ROBOTS = """User-agent: *
Disallow: /private/
Allow: /private/public/
Disallow: /*.pdf$
Allow: /downloads/*.pdf$
Disallow: /tmp*
Crawl-delay: 1
"""


def test_parse_robots_rules_keeps_allow():
    rules, delay = politeness.parse_robots_rules(RFC_ROBOTS)
    assert ("/private/", False) in rules
    assert ("/private/public/", True) in rules
    assert ("/*.pdf$", False) in rules
    assert delay == 1000


def test_robots_decision_longest_match():
    rules, _ = politeness.parse_robots_rules(RFC_ROBOTS)
    d = politeness.robots_decision
    assert d("/", rules) is True
    assert d("/private/x", rules) is False
    assert d("/private/public/x", rules) is True     # longer Allow wins
    assert d("/doc.pdf", rules) is False              # wildcard + anchor
    assert d("/doc.pdfx", rules) is True              # '$' anchors the end
    assert d("/downloads/a.pdf", rules) is True       # longer Allow wins
    assert d("/tmpfile", rules) is False              # trailing wildcard-free prefix
    assert d("/elsewhere", rules) is True


def test_robots_decision_tie_prefers_allow():
    rules = [("/dir/", False), ("/dir/", True)]
    assert politeness.robots_decision("/dir/x", rules) is True


def test_parse_robots_rules_empty_disallow_matches_nothing():
    rules, _ = politeness.parse_robots_rules("User-agent: *\nDisallow:\n")
    assert rules == []
    assert politeness.robots_decision("/anything", rules) is True


def test_robots_allow_rfc_catalyst(spark):
    from pyspark.sql import functions as F

    robots_src = spark.createDataFrame(
        [("a.com", RFC_ROBOTS), ("b.com", None)], "host string, robots_txt string"
    )
    rules = politeness.robots_rules_table(robots_src)
    paths = [
        ("a.com", "/private/x", False),
        ("a.com", "/private/public/x", True),
        ("a.com", "/doc.pdf", False),
        ("a.com", "/downloads/a.pdf", True),
        ("a.com", "/tmpfile", False),
        ("a.com", "/ok", True),
        ("b.com", "/anything", True),      # no rules -> allow
        ("c.com", "/anything", True),      # unknown host -> allow
    ]
    df = spark.createDataFrame(
        [(h, p) for h, p, _ in paths], "host string, path string"
    )
    out = politeness.robots_allow_rfc(df, rules)
    got = {(r["host"], r["path"]) for r in out.select("host", "path").collect()}
    for h, p, want in paths:
        assert ((h, p) in got) == want, (h, p)
    # scalar decision parity on the same cases
    rules_scalar, _ = politeness.parse_robots_rules(RFC_ROBOTS)
    for h, p, want in paths:
        if h == "a.com":
            assert politeness.robots_decision(p, rules_scalar) == want, p


def test_schedule_round_rfc_mode(spark):
    from pyspark.sql import functions as F

    robots_src = spark.createDataFrame(
        [("a.com", RFC_ROBOTS), ("b.com", None)], "host string, robots_txt string"
    )
    rules = politeness.robots_rules_table(robots_src)
    cands = spark.createDataFrame(
        [
            ("http://a.com/private/x", 0.9, 1, 11),
            ("http://a.com/private/public/x", 0.8, 2, 12),
            ("http://a.com/downloads/ok.pdf", 0.7, 3, 13),
            ("http://a.com/doc.pdf", 0.6, 4, 14),
            ("http://b.com/anything", 0.5, 5, 15),
        ],
        "canonical_url string, priority double, domain_hash long, url_hash long",
    )
    sched, disallowed = politeness.schedule_round(
        cands, rules, default_budget=10, n_salts=4,
        return_disallowed=True, robots_mode="rfc",
    )
    got = {r["canonical_url"] for r in sched.collect()}
    assert got == {
        "http://a.com/private/public/x",   # longer Allow wins
        "http://a.com/downloads/ok.pdf",   # longer Allow wins
        "http://b.com/anything",           # no rules -> allow
    }
    dis = {r["canonical_url"] for r in disallowed.collect()}
    assert dis == {"http://a.com/private/x", "http://a.com/doc.pdf"}
    # per-host ranks are dense from 1
    ranks = [(r["host"], r["host_rank"]) for r in sched.collect()]
    assert ("b.com", 1) in ranks


def test_process_round_equals_schedule_round_union(spark):
    """process_round (single-pass) ≡ schedule_round + disallowed union:
    same scheduled rows and ranks, same retired identities, and
    allowed-but-over-budget rows absent from both."""
    import numpy as np

    from ccspark import synth
    from ccspark import functions as CF
    from pyspark.sql import functions as F

    n_hosts = 40
    robots = synth.gen_robots(spark, n_hosts, 42)
    raw = synth.gen_seeds(spark, 3000, n_hosts, 42)
    cands = (
        CF.with_canonical_urlfp(raw)
        .filter("url_valid")
        .groupBy("domain_hash", "url_hash")
        .agg(
            F.min("url").alias("url"),
            F.min("canonical_url").alias("canonical_url"),
            F.max("priority").alias("priority"),
        )
    )
    sched, disallowed = politeness.schedule_round(
        cands, robots, default_budget=3, n_salts=4, return_disallowed=True
    )
    proc = politeness.process_round(cands, robots, default_budget=3, n_salts=4)

    want_sched = {
        (r["host"], r["host_rank"], r["canonical_url"]) for r in sched.collect()
    }
    got_sched = {
        (r["host"], r["host_rank"], r["canonical_url"])
        for r in proc.filter(F.col("host_rank").isNotNull()).collect()
    }
    assert got_sched == want_sched and len(want_sched) > 0

    want_retired = {(r["domain_hash"], r["url_hash"]) for r in disallowed.collect()}
    got_retired = {
        (r["domain_hash"], r["url_hash"])
        for r in proc.filter(F.col("host_rank").isNull()).collect()
    }
    assert got_retired == want_retired and len(want_retired) > 0

    # over-budget rows are in neither output
    n_cands = cands.count()
    assert proc.count() < n_cands
