"""Invalid-usage battery, modeled on the reference's
test/system/session/rows/test_invalid.py (re-expressed against this
engine's architecture — no mock accountants): wrong table names,
schema violations, bound violations, budget-kind mismatches, and
lifecycle misuse must fail with clear errors, and a failed evaluate
must never consume budget.
"""

import pandas as pd
import pytest

from tumult_analytics_spark import (
    AddOneRow,
    AddRowsWithID,
    ApproxDPBudget,
    KeySet,
    MaxRowsPerID,
    PureDPBudget,
    QueryBuilder,
    RhoZCDPBudget,
    Session,
)

INF = PureDPBudget(float("inf"))


@pytest.fixture(scope="module")
def sess(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"A": ["0", "1", "1"], "B": [0, 1, 2], "X": [0.0, 1.0, 2.0]})
    )
    return Session.from_dataframe(INF, "private", df, AddOneRow())


class TestInvalidQueries:
    def test_nonexistent_table(self, sess):
        q = QueryBuilder("private_source_not_in_catalog").count()
        with pytest.raises((KeyError, ValueError)):
            sess.evaluate(q, INF)

    def test_unknown_groupby_column(self, sess):
        q = (
            QueryBuilder("private")
            .groupby(KeySet.from_dict({"NOPE": ["a"]}))
            .count()
        )
        with pytest.raises(ValueError):
            sess.evaluate(q, INF)

    def test_unknown_measure_column(self, sess):
        with pytest.raises(ValueError):
            sess.evaluate(QueryBuilder("private").sum("NOPE", 0, 1), INF)

    def test_inverted_bounds(self, sess):
        with pytest.raises(ValueError):
            QueryBuilder("private").sum("X", 10, 0)

    def test_sum_on_string_column(self, sess):
        with pytest.raises(ValueError):
            sess.evaluate(QueryBuilder("private").sum("A", 0, 1), INF)

    def test_filter_on_unknown_column_fails_at_evaluate(self, sess):
        q = QueryBuilder("private").filter("NOPE > 1").count()
        with pytest.raises(Exception):
            sess.evaluate(q, INF)

    def test_enforce_requires_id_table(self, sess):
        q = QueryBuilder("private").enforce(MaxRowsPerID(2)).count()
        with pytest.raises(ValueError):
            sess.evaluate(q, INF)


class TestBudgetKindMismatches:
    def test_zcdp_budget_on_puredp_session(self, spark):
        df = spark.createDataFrame(pd.DataFrame({"B": [1, 2]}))
        s = Session.from_dataframe(PureDPBudget(2), "t", df, AddOneRow())
        with pytest.raises((TypeError, ValueError)):
            s.evaluate(QueryBuilder("t").count(), RhoZCDPBudget(1))

    def test_approxdp_budget_on_puredp_session(self, spark):
        df = spark.createDataFrame(pd.DataFrame({"B": [1, 2]}))
        s = Session.from_dataframe(PureDPBudget(2), "t", df, AddOneRow())
        with pytest.raises((TypeError, ValueError)):
            s.evaluate(QueryBuilder("t").count(), ApproxDPBudget(1, 1e-6))

    def test_failed_evaluate_consumes_nothing(self, spark):
        df = spark.createDataFrame(pd.DataFrame({"B": [1, 2]}))
        s = Session.from_dataframe(PureDPBudget(2), "t", df, AddOneRow())
        for bad in (
            QueryBuilder("missing").count(),
            QueryBuilder("t").sum("NOPE", 0, 1),
        ):
            with pytest.raises(Exception):
                s.evaluate(bad, PureDPBudget(1))
            assert s.remaining_privacy_budget == PureDPBudget(2)


class TestSessionConstructionErrors:
    def test_duplicate_source_id(self, spark):
        df = spark.createDataFrame(pd.DataFrame({"B": [1]}))
        b = (
            Session.Builder()
            .with_privacy_budget(INF)
            .with_private_dataframe("t", df, AddOneRow())
        )
        with pytest.raises(ValueError):
            b.with_private_dataframe("t", df, AddOneRow())

    def test_no_private_dataframe(self):
        with pytest.raises(ValueError):
            Session.Builder().with_privacy_budget(INF).build()

    def test_no_budget(self, spark):
        df = spark.createDataFrame(pd.DataFrame({"B": [1]}))
        b = Session.Builder().with_private_dataframe("t", df, AddOneRow())
        with pytest.raises(ValueError):
            b.build()

    def test_id_column_missing_from_dataframe(self, spark):
        df = spark.createDataFrame(pd.DataFrame({"B": [1]}))
        with pytest.raises(ValueError):
            Session.from_dataframe(
                INF, "t", df, AddRowsWithID(id_column="uid")
            )

    def test_view_name_collision(self, sess):
        sess.create_view(QueryBuilder("private").filter("B > 0"), "v1", cache=False)
        try:
            with pytest.raises(ValueError):
                sess.create_view(
                    QueryBuilder("private").filter("B > 1"), "v1", cache=False
                )
            with pytest.raises(ValueError):
                sess.create_view(
                    QueryBuilder("private").filter("B > 1"), "private",
                    cache=False,
                )
        finally:
            sess.delete_view("v1")
