"""robots.txt parsing + filtering: group splitting, agent precedence,
longest-match / allow-tie semantics, wildcard rejection."""

import pandas as pd
import pytest

from fatespark.robots import parse_robots, robots_filter

ROBOTS = """# crawler policy
User-agent: otherbot
Disallow: /

User-agent: *
User-agent: legacybot
Disallow: /private
Allow: /private/pub
Disallow: /tmp
Allow:
"""

EXACT = """User-agent: fatesbot
Disallow: /p

User-agent: *
Disallow: /
"""


def _rules(spark, txt, host="h.test", agent="fatesbot"):
    df = spark.createDataFrame(
        pd.DataFrame({"host": [host], "robots_txt": [txt]}))
    return {(r["allow"], r["path"])
            for r in parse_robots(df, agent=agent).collect()}


def _filter(spark, txt, urls, agent="fatesbot"):
    rdf = spark.createDataFrame(
        pd.DataFrame({"host": ["h.test"], "robots_txt": [txt]}))
    udf = spark.createDataFrame(pd.DataFrame({"url": urls}))
    rules = parse_robots(rdf, agent=agent)
    return {r["url"]: (r["allowed"], r["rule"])
            for r in robots_filter(udf, rules).collect()}


class TestParse:
    def test_star_group_selected_multi_ua(self, spark):
        assert _rules(spark, ROBOTS) == {
            (False, "/private"), (True, "/private/pub"),
            (False, "/tmp")}

    def test_exact_agent_beats_star(self, spark):
        assert _rules(spark, EXACT) == {(False, "/p")}
        # a different crawler token falls back to the * group
        assert _rules(spark, EXACT, agent="nosuch") == {(False, "/")}

    def test_case_insensitive_and_comments(self, spark):
        txt = "USER-AGENT: FatesBot # us\nDISALLOW: /x # nope\n"
        assert _rules(spark, txt) == {(False, "/x")}

    def test_empty_disallow_is_noop(self, spark):
        assert _rules(spark, "User-agent: *\nDisallow:\n") == set()

    def test_wildcard_rejected_loudly(self, spark):
        with pytest.raises(ValueError, match="wildcard"):
            _rules(spark, "User-agent: *\nDisallow: /a/*/b\n")


class TestFilter:
    def test_longest_match_and_allow_tie(self, spark):
        got = _filter(spark, ROBOTS, [
            "http://h.test/private/x",       # /private (deny)
            "http://h.test/private/pub/y",   # /private/pub (allow, longer)
            "http://h.test/tmp/z",           # /tmp (deny)
            "http://h.test/ok",              # no rule -> allow
            "http://h.test",                 # bare host -> path "/"
        ])
        assert got["http://h.test/private/x"] == (False, "/private")
        assert got["http://h.test/private/pub/y"] == (True, "/private/pub")
        assert got["http://h.test/tmp/z"] == (False, "/tmp")
        assert got["http://h.test/ok"] == (True, None)
        assert got["http://h.test"] == (True, None)

    def test_allow_wins_equal_length_tie(self, spark):
        txt = "User-agent: *\nDisallow: /abc\nAllow: /abc\n"
        got = _filter(spark, txt, ["http://h.test/abc/x"])
        assert got["http://h.test/abc/x"] == (True, "/abc")

    def test_unknown_host_allowed(self, spark):
        rdf = spark.createDataFrame(pd.DataFrame(
            {"host": ["other.test"], "robots_txt": [ROBOTS]}))
        udf = spark.createDataFrame(pd.DataFrame(
            {"url": ["http://h.test/private/x"]}))
        out = robots_filter(udf, parse_robots(rdf)).collect()[0]
        assert out["allowed"] is True and out["rule"] is None

    def test_broadcast_in_plan(self, spark):
        rdf = spark.createDataFrame(pd.DataFrame(
            {"host": ["h.test"], "robots_txt": [ROBOTS]}))
        udf = spark.createDataFrame(pd.DataFrame(
            {"url": ["http://h.test/a"]}))
        plan = robots_filter(udf, parse_robots(rdf))._jdf \
            .queryExecution().executedPlan().toString()
        assert "Broadcast" in plan
