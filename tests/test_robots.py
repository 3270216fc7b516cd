"""robots.txt evaluation (functions/robots.py): section selection,
longest-prefix-match with allow-wins ties, defaults."""

from __future__ import annotations

from casie_spark.functions.robots import apply_robots, robots_rules

ROBOTS_A = "\n".join([
    "# crawler policy",
    "User-agent: badbot",
    "Disallow: /",
    "",
    "User-agent: otherbot",
    "User-agent: *",          # consecutive UA lines share one record
    "Disallow: /private",
    "Allow: /private/ok",
    "Disallow:",              # empty value = no rule
    "Disallow: /tmp",
])
ROBOTS_B = "User-agent:*\nDisallow: /"   # no space after colon


def _robots(spark):
    return spark.createDataFrame(
        [("a.org", ROBOTS_A), ("b.org", ROBOTS_B)],
        "host string, robots_txt string")


def test_robots_rules_star_sections_only(spark):
    rules = {(r["host"], r["rule_path"], r["allow"])
             for r in robots_rules(_robots(spark)).collect()}
    assert rules == {
        ("a.org", "/private", False),
        ("a.org", "/private/ok", True),
        ("a.org", "/tmp", False),
        ("b.org", "/", False),
    }  # badbot's Disallow:/ excluded; empty Disallow dropped


def test_apply_robots_longest_match_and_defaults(spark):
    urls = spark.createDataFrame(
        [("https://a.org/doc/1",),          # no rule -> allowed
         ("https://a.org/private/x",),      # /private -> blocked
         ("https://a.org/private/ok/x",),   # longer Allow wins
         ("https://a.org/tmp/y",),          # host-specific disallow
         ("https://b.org/anything",),       # Disallow: / blocks all
         ("https://c.org/no/robots",),      # unknown host -> allowed
         ("https://a.org",)],               # bare host -> path "/"
        "url string")
    got = {r["url"]: r["crawl_allowed"]
           for r in apply_robots(urls, _robots(spark)).collect()}
    assert got == {
        "https://a.org/doc/1": True,
        "https://a.org/private/x": False,
        "https://a.org/private/ok/x": True,
        "https://a.org/tmp/y": False,
        "https://b.org/anything": False,
        "https://c.org/no/robots": True,
        "https://a.org": True,
    }


def test_apply_robots_allow_wins_length_tie(spark):
    robots = spark.createDataFrame(
        [("t.org", "User-agent: *\nDisallow: /a/\nAllow: /a/b")],
        "host string, robots_txt string")
    urls = spark.createDataFrame(
        [("https://t.org/a/bc",)], "url string")
    # /a/b (allow, len 4) beats /a/ (disallow, len 3)
    r = apply_robots(urls, robots).first()
    assert r["crawl_allowed"] is True
