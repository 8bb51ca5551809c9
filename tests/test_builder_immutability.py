"""QueryBuilder reuse semantics, ported from the reference's builder
battery (test/unit/test_query_builder.py: test_query_immutability,
test_string_or_enum_mechanisms_are_equal, test_unknown_mechanisms):
building a query must never mutate the builder it came from, so one
base builder can fan out into many queries — the pattern every
notebook user relies on."""

import pytest

import tumult_analytics_spark as ta
from tumult_analytics_spark import KeySet, PureDPBudget, QueryBuilder
from tumult_analytics_spark.plans import expr as E

INF = PureDPBudget(float("inf"))


@pytest.fixture()
def sess(spark):
    df = spark.createDataFrame(
        [("A", 1, 1.0), ("A", 2, 2.0), ("B", 3, 3.0), ("B", 4, 4.0)],
        "g string, n long, x double",
    )
    return ta.Session.from_dataframe(INF, "t", df, ta.AddOneRow())


class TestBuilderReuse:
    def test_root_builder_reused_for_two_queries(self, sess):
        base = QueryBuilder("t")
        q1 = base.count()
        q2 = base.sum("n", 0, 10, name="s")
        r1 = sess.evaluate(q1, INF).collect()
        r2 = sess.evaluate(q2, INF).collect()
        assert r1[0]["count"] == 4
        assert r2[0]["s"] == 10
        # building q2 did not corrupt q1: re-evaluating q1 still works
        assert sess.evaluate(q1, INF).collect()[0]["count"] == 4

    def test_transformed_builder_fans_out(self, sess):
        base = QueryBuilder("t").filter("n >= 2")
        ks = KeySet.from_dict({"g": ["A", "B"]})
        q_count = base.count()
        q_grouped = base.groupby(ks).sum("n", 0, 10, name="s")
        q_mapped = base.map(
            lambda row: {"n2": row["n"] * 2}, new_column_types={"n2": "INTEGER"}
        ).sum("n2", 0, 20, name="s2")
        assert sess.evaluate(q_count, INF).collect()[0]["count"] == 3
        got = {
            r["g"]: r["s"] for r in sess.evaluate(q_grouped, INF).collect()
        }
        assert got == {"A": 2, "B": 7}
        assert sess.evaluate(q_mapped, INF).collect()[0]["s2"] == 18
        # the filter builder is still reusable after all three
        assert sess.evaluate(base.count(), INF).collect()[0]["count"] == 3

    def test_grouped_builder_reused_for_two_aggregations(self, sess):
        ks = KeySet.from_dict({"g": ["A", "B"]})
        gb = QueryBuilder("t").groupby(ks)
        counts = {
            r["g"]: r["count"] for r in sess.evaluate(gb.count(), INF).collect()
        }
        sums = {
            r["g"]: r["s"]
            for r in sess.evaluate(gb.sum("n", 0, 10, name="s"), INF).collect()
        }
        assert counts == {"A": 2, "B": 2}
        assert sums == {"A": 3, "B": 7}

    def test_query_exprs_are_frozen(self):
        # Query expressions are immutable values (the reference uses
        # frozen attrs classes; this engine uses frozen dataclasses), so
        # a built query cannot be corrupted after the fact.
        q = QueryBuilder("t").count()
        with pytest.raises(Exception):
            q._expr.output_column = "hacked"


class TestMechanismArguments:
    def test_string_and_enum_mechanisms_agree(self, sess):
        q_str = QueryBuilder("t").count(mechanism="laplace")
        q_enum = QueryBuilder("t").count(mechanism=E.CountMechanism.LAPLACE)
        assert q_str._expr.mechanism == q_enum._expr.mechanism
        assert (
            sess.evaluate(q_str, INF).collect()[0]["count"]
            == sess.evaluate(q_enum, INF).collect()[0]["count"]
        )

    def test_unknown_mechanism_rejected(self):
        with pytest.raises((ValueError, KeyError)):
            QueryBuilder("t").count(mechanism="not_a_mechanism")
