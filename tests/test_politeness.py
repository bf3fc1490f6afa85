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
