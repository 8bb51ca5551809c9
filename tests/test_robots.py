"""robots.txt politeness gate: group parsing (RFC 9309 core) and
longest-prefix-match gating with the allow-wins tie-break."""

from pyspark.sql import functions as F

from tumult_analytics_spark.operators import robots as R

ROBOTS_A = (
    "# comments everywhere\r\n"
    "User-agent: *\r\n"
    "Disallow: /private\r\n"
    "Allow: /private/ok  # trailing comment\r\n"
    "Crawl-delay: 10\r\n"
    "\r\n"
    "User-agent: GoodBot\r\n"
    "User-agent: OtherBot\r\n"
    "Disallow: /only-good\r\n"
    "Disallow:\r\n"
)
ROBOTS_B = "User-agent: *\nDisallow: /\n"


def _rules(spark):
    df = spark.createDataFrame(
        [("a.test", ROBOTS_A), ("b.test", ROBOTS_B), ("c.test", "")],
        "domain string, robots string",
    )
    return R.parse_robots(df, "domain", "robots")


class TestParse:
    def test_groups_and_directives(self, spark):
        rows = {
            (r["domain"], r["agent"], r["directive"], r["prefix"])
            for r in _rules(spark).collect()
        }
        assert rows == {
            ("a.test", "*", "disallow", "/private"),
            ("a.test", "*", "allow", "/private/ok"),
            # stacked UA lines share the group's rules
            ("a.test", "goodbot", "disallow", "/only-good"),
            ("a.test", "otherbot", "disallow", "/only-good"),
            # empty Disallow == allow everything
            ("a.test", "goodbot", "allow", ""),
            ("a.test", "otherbot", "allow", ""),
            ("b.test", "*", "disallow", "/"),
        }

    def test_null_and_empty_robots(self, spark):
        df = spark.createDataFrame(
            [("x.test", None)], "domain string, robots string"
        )
        assert R.parse_robots(df, "domain", "robots").count() == 0


class TestGate:
    def _gate(self, spark, urls, agent="*"):
        udf = spark.createDataFrame(urls, "domain string, path string")
        out = R.robots_gate(
            udf, _rules(spark), "domain", "path", user_agent=agent
        )
        return {
            (r["domain"], r["path"]): r["crawl_allowed"]
            for r in out.collect()
        }

    def test_longest_match_and_allow_tiebreak(self, spark):
        got = self._gate(spark, [
            ("a.test", "/public/x"),        # no rule matches -> allowed
            ("a.test", "/private/x"),       # /private disallow wins
            ("a.test", "/private/ok/x"),    # longer allow overrides
            ("b.test", "/anything"),        # blanket disallow
            ("c.test", "/whatever"),        # robots empty -> allowed
            ("nodomain.test", "/x"),        # no robots at all -> allowed
        ])
        assert got == {
            ("a.test", "/public/x"): True,
            ("a.test", "/private/x"): False,
            ("a.test", "/private/ok/x"): True,
            ("b.test", "/anything"): False,
            ("c.test", "/whatever"): True,
            ("nodomain.test", "/x"): True,
        }

    def test_exact_agent_group_overrides_star(self, spark):
        # GoodBot has its own group on a.test: the * group is ignored,
        # so /private is ALLOWED for it while /only-good is not.
        got = self._gate(spark, [
            ("a.test", "/private/x"),
            ("a.test", "/only-good/x"),
            ("b.test", "/anything"),   # no GoodBot group -> * applies
        ], agent="GoodBot")
        assert got == {
            ("a.test", "/private/x"): True,
            ("a.test", "/only-good/x"): False,
            ("b.test", "/anything"): False,
        }

    def test_equal_length_allow_beats_disallow(self, spark):
        df = spark.createDataFrame(
            [("t.test", "User-agent: *\nDisallow: /p\nAllow: /p\n")],
            "domain string, robots string",
        )
        rules = R.parse_robots(df, "domain", "robots")
        urls = spark.createDataFrame(
            [("t.test", "/p/x")], "domain string, path string"
        )
        out = R.robots_gate(urls, rules, "domain", "path").collect()
        assert out[0]["crawl_allowed"] is True

    def test_no_url_shuffle(self, spark):
        # the gate must not exchange the URL corpus: broadcast join +
        # array fold only (the rules side may aggregate freely)
        urls = spark.createDataFrame(
            [("a.test", "/x")], "domain string, path string"
        )
        out = R.robots_gate(urls, _rules(spark), "domain", "path")
        plan = out._jdf.queryExecution().executedPlan().toString()
        before_broadcast = plan.split("BroadcastExchange")[0]
        assert "Exchange hashpartitioning" not in before_broadcast
