"""robots.txt parse + crawl-allow semantics (webfilter/robots.py):
RFC 9309 group selection, longest-match precedence, allow-wins-ties,
default allow, and the parser's line-algebra edge cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from webfilter.robots import parse_robots, robots_decisions

ROBOTS = """# demo
User-agent: *
Disallow: /a
Allow: /a/b

User-agent: specialbot
User-agent: otherbot
Disallow: /s
Disallow:
Crawl-delay: 7
allow: /s/ok
"""


def _rules(spark):
    df = spark.createDataFrame(
        [("h1.example", ROBOTS)], "host string, robots_txt string"
    )
    return parse_robots(df)


def _urls(spark, rows):
    return spark.createDataFrame(rows, "url string, host string, upath string")


def test_parse_groups_and_noops(spark):
    rules = {(r.group_id, r.agent, r.path, r.allow) for r in _rules(spark).collect()}
    assert rules == {
        (1, "*", "/a", False),
        (1, "*", "/a/b", True),
        # consecutive UA lines share group 2; empty Disallow and
        # Crawl-delay vanish
        (2, "specialbot", "/s", False),
        (2, "specialbot", "/s/ok", True),
        (2, "otherbot", "/s", False),
        (2, "otherbot", "/s/ok", True),
    }


def test_longest_match_and_group_selection(spark):
    rules = _rules(spark)
    urls = _urls(
        spark,
        [
            ("u1", "h1.example", "/a/x"),      # /a deny
            ("u2", "h1.example", "/a/b/c"),    # /a/b allow beats /a
            ("u3", "h1.example", "/other"),    # no match -> allow
            ("u4", "nohost.example", "/a/x"),  # no robots -> allow
        ],
    )
    got = {r.url: (r.allowed, r.rule_path)
           for r in robots_decisions(urls, rules, "genericbot").collect()}
    assert got == {
        "u1": (False, "/a"),
        "u2": (True, "/a/b"),
        "u3": (True, None),
        "u4": (True, None),
    }
    # specific agent: ONLY its group applies — /a is now unrestricted,
    # /s is not
    got2 = {r.url: r.allowed
            for r in robots_decisions(
                _urls(spark, [("v1", "h1.example", "/a/x"),
                              ("v2", "h1.example", "/s/x"),
                              ("v3", "h1.example", "/s/ok/y")]),
                rules, "SpecialBot").collect()}
    assert got2 == {"v1": True, "v2": False, "v3": True}


def test_allow_wins_length_ties(spark):
    df = spark.createDataFrame(
        [("h.example", "User-agent: *\nDisallow: /xx\nAllow: /xy")],
        "host string, robots_txt string",
    )
    urls = _urls(spark, [("t1", "h.example", "/xy/page")])
    # same-length prefixes never both match one path; build a true
    # tie instead: identical path, conflicting verdicts
    df2 = spark.createDataFrame(
        [("h.example", "User-agent: *\nDisallow: /p\nAllow: /p")],
        "host string, robots_txt string",
    )
    got = robots_decisions(
        _urls(spark, [("t2", "h.example", "/p/1")]), parse_robots(df2), "x"
    ).collect()[0]
    assert got.allowed is True  # allow beats disallow on the tie
    got1 = robots_decisions(urls, parse_robots(df), "x").collect()[0]
    assert got1.allowed is True and got1.rule_path == "/xy"


def test_rules_join_is_broadcast(spark):
    """The page-side join against robots rules must be a broadcast
    hash join — no shuffle of the (100 TB) url side."""
    rules = _rules(spark)
    urls = _urls(spark, [("u1", "h1.example", "/a/x")])
    plan = robots_decisions(urls, rules, "bot")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
