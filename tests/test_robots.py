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

    def test_broadcast_guard_small_rules_broadcasts(self, spark):
        # auto mode (broadcast_rules=None) with a tiny rule table:
        # the probe stays under the limit -> BroadcastHashJoin.
        urls = spark.createDataFrame(
            [("a.test", "/x")], "domain string, path string"
        )
        out = R.robots_gate(
            urls, _rules(spark), "domain", "path", broadcast_rules=None
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan

    def test_broadcast_guard_large_rules_shuffle_join(self, spark):
        # force the "too many rules to broadcast" path via a zero
        # limit: the gate must fall back to a plain equi-join (SMJ or
        # shuffled-hash — anything but a broadcast of the rule side)
        # and still produce identical answers.
        urls = spark.createDataFrame(
            [("a.test", "/private/x"), ("a.test", "/private/ok/x")],
            "domain string, path string",
        )
        out = R.robots_gate(
            urls, _rules(spark), "domain", "path",
            broadcast_rule_limit=0,
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan
        assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan)
        got = {(r["path"]): r["crawl_allowed"] for r in out.collect()}
        assert got == {"/private/x": False, "/private/ok/x": True}


class TestEmptyExactGroup:
    def test_empty_exact_group_supersedes_star(self, spark):
        # RFC 9309 group selection: an exact-agent group with NO
        # rules still exists, allows everything, and supersedes the
        # blanket * Disallow. (Note: blank-line-separated CONSECUTIVE
        # UA lines merge into one group per the RFC ABNF, so the
        # empty-group case is a trailing UA group with no rules.)
        df = spark.createDataFrame(
            [(
                "e.test",
                "User-agent: *\nDisallow: /\n\n"
                "User-agent: trainbot\n",
            )],
            "domain string, robots string",
        )
        rules = R.parse_robots(df, "domain", "robots")
        sentinel = [
            r for r in rules.collect() if r["agent"] == "trainbot"
        ]
        assert [(r["directive"], r["prefix"]) for r in sentinel] == [
            ("allow", "")
        ]
        urls = spark.createDataFrame(
            [("e.test", "/anything")], "domain string, path string"
        )
        out = R.robots_gate(
            urls, rules, "domain", "path", user_agent="trainbot"
        ).collect()
        assert out[0]["crawl_allowed"] is True
        # ...while an unrelated agent is still governed by *.
        out2 = R.robots_gate(
            urls, rules, "domain", "path", user_agent="otherbot"
        ).collect()
        assert out2[0]["crawl_allowed"] is False


WILDCARDS = (
    # Google's published wildcard examples + RFC 9309 $ anchor.
    "User-agent: *\n"
    "Disallow: /*.pdf$\n"
    "Disallow: /private*/\n"
    "Allow: /private*/ok\n"
    "Disallow: /fish*.php\n"
)


class TestWildcards:
    def _gate(self, spark, paths):
        df = spark.createDataFrame(
            [("w.test", WILDCARDS)], "domain string, robots string"
        )
        rules = R.parse_robots(df, "domain", "robots")
        urls = spark.createDataFrame(
            [("w.test", p) for p in paths], "domain string, path string"
        )
        out = R.robots_gate(urls, rules, "domain", "path")
        return {r["path"]: r["crawl_allowed"] for r in out.collect()}

    def test_rx_translation(self, spark):
        df = spark.createDataFrame(
            [("w.test", WILDCARDS)], "domain string, robots string"
        )
        rx = {
            r["prefix"]: r["rx"]
            for r in R.parse_robots(df, "domain", "robots").collect()
        }
        assert rx["/*.pdf$"] == r"^/.*\.pdf$"
        assert rx["/private*/"] == "^/private.*/"
        assert rx["/fish*.php"] == r"^/fish.*\.php"

    def test_dollar_anchor(self, spark):
        got = self._gate(spark, ["/docs/a.pdf", "/docs/a.pdf?x=1"])
        assert got["/docs/a.pdf"] is False          # anchored match
        assert got["/docs/a.pdf?x=1"] is True       # $ anchor misses

    def test_star_spans_segments(self, spark):
        got = self._gate(
            spark,
            ["/private-x/a", "/privateX/deep/b", "/private-x/ok/c"],
        )
        assert got["/private-x/a"] is False
        assert got["/privateX/deep/b"] is False     # * spans chars
        assert got["/private-x/ok/c"] is True       # longer allow wins

    def test_star_mid_rule(self, spark):
        got = self._gate(
            spark, ["/fishheads/catfish.php", "/fish.html"]
        )
        assert got["/fishheads/catfish.php"] is False
        assert got["/fish.html"] is True

    def test_prefix_rules_keep_null_rx(self, spark):
        df = spark.createDataFrame(
            [("p.test", "User-agent: *\nDisallow: /plain\n")],
            "domain string, robots string",
        )
        rows = R.parse_robots(df, "domain", "robots").collect()
        assert rows[0]["rx"] is None

    def test_mid_string_dollar_is_literal(self, spark):
        # Google's parser only anchors a TRAILING $; elsewhere it is
        # a literal character.
        df = spark.createDataFrame(
            [("d.test", "User-agent: *\nDisallow: /a$b*\n")],
            "domain string, robots string",
        )
        rules = R.parse_robots(df, "domain", "robots")
        urls = spark.createDataFrame(
            [("d.test", "/a$b-tail"), ("d.test", "/ab")],
            "domain string, path string",
        )
        out = R.robots_gate(urls, rules, "domain", "path")
        got = {r["path"]: r["crawl_allowed"] for r in out.collect()}
        assert got == {"/a$b-tail": False, "/ab": True}


class TestCrawlDirectives:
    ROBOTS = (
        "Sitemap: https://a.test/sitemap.xml\n"
        "User-agent: *\n"
        "Crawl-delay: 10\n"
        "Disallow: /private\n"
        "\n"
        "User-agent: trainbot\n"
        "Crawl-delay: 2.5\n"
        "Disallow: /x\n"
        "Sitemap: https://a.test/news.xml\n"
    )

    def _dirs(self, spark, agent):
        df = spark.createDataFrame(
            [
                ("a.test", self.ROBOTS),
                ("b.test", "User-agent: *\nDisallow: /\n"),
                ("c.test", None),
            ],
            "domain string, robots string",
        )
        from tumult_analytics_spark.operators.robots import (
            crawl_directives,
        )

        return {
            r["domain"]: (r["crawl_delay"], list(r["sitemaps"]))
            for r in crawl_directives(
                df, "domain", "robots", user_agent=agent
            ).collect()
        }

    def test_exact_group_delay_supersedes_star(self, spark):
        got = self._dirs(spark, "TrainBot")
        assert got["a.test"][0] == 2.5
        assert got["b.test"] == (None, [])
        assert got["c.test"] == (None, [])

    def test_star_delay_for_unlisted_agent(self, spark):
        got = self._dirs(spark, "otherbot")
        assert got["a.test"][0] == 10.0

    def test_sitemaps_are_file_global_and_sorted(self, spark):
        got = self._dirs(spark, "trainbot")
        assert got["a.test"][1] == [
            "https://a.test/news.xml", "https://a.test/sitemap.xml",
        ]

    def test_max_delay_and_bad_values(self, spark):
        df = spark.createDataFrame(
            [(
                "m.test",
                "User-agent: a\nUser-agent: *\nCrawl-delay: 3\n\n"
                "User-agent: *\nCrawl-delay: 7\n"
                "Crawl-delay: nonsense\nCrawl-delay: -4\n",
            )],
            "domain string, robots string",
        )
        from tumult_analytics_spark.operators.robots import (
            crawl_directives,
        )

        row = crawl_directives(df, "domain", "robots").collect()[0]
        # two governing * groups (3 and 7): max wins; junk ignored
        assert row["crawl_delay"] == 7.0
