"""Slice 0: one real query end-to-end at infinite budget (exact answers)."""

import pandas as pd
import pytest

from tumult_analytics_spark import (
    AddOneRow,
    KeySet,
    PureDPBudget,
    QueryBuilder,
    Session,
)


@pytest.fixture()
def sess(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "A": ["0", "1", "1", "1"],
                "B": [0, 0, 1, 2],
                "X": [0, 1, 1, 1],
            }
        )
    )
    return Session.from_dataframe(
        privacy_budget=PureDPBudget(float("inf")),
        source_id="private",
        dataframe=df,
        protected_change=AddOneRow(),
    )


def test_global_count(sess):
    result = sess.evaluate(QueryBuilder("private").count(), PureDPBudget(float("inf")))
    assert result.collect()[0]["count"] == 4


def test_filter_groupby_count(sess):
    ks = KeySet.from_dict({"A": ["0", "1", "2"]})
    q = QueryBuilder("private").filter("B < 2").groupby(ks).count()
    result = sess.evaluate(q, PureDPBudget(float("inf")))
    got = {r["A"]: r["count"] for r in result.collect()}
    # group "2" is absent from the data -> zero; extra data groups dropped
    assert got == {"0": 1, "1": 2, "2": 0}


def test_finite_budget_noise_bounded(sess):
    ks = KeySet.from_dict({"A": ["0", "1"]})
    q = QueryBuilder("private").groupby(ks).count()
    result = sess.evaluate(q, PureDPBudget(100))
    got = {r["A"]: r["count"] for r in result.collect()}
    # epsilon=100 -> scale 0.01; noise is essentially always 0
    assert got == {"0": 1, "1": 3}


def test_budget_accounting(sess):
    sess2_budget = sess.remaining_privacy_budget
    assert sess2_budget.is_infinite()


def test_budget_deduction(spark):
    df = spark.createDataFrame(pd.DataFrame({"A": [1, 2, 3]}))
    s = Session.from_dataframe(
        privacy_budget=PureDPBudget(1),
        source_id="t",
        dataframe=df,
        protected_change=AddOneRow(),
    )
    s.evaluate(QueryBuilder("t").count(), PureDPBudget(0.5))
    assert float(s.remaining_privacy_budget.epsilon) == pytest.approx(0.5)
    with pytest.raises(RuntimeError, match="privacy budget"):
        s.evaluate(QueryBuilder("t").count(), PureDPBudget(0.75))
