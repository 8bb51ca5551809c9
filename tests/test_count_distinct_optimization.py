"""Count-distinct -> count optimization on ID tables (reference
``_base_measurement_visitor.py:217-300`` and
``test/system/session/ids/test_count_distinct_optimization.py``):
counting distinct IDs works WITHOUT a user MaxRowsPerID constraint,
because it is rewritten to a one-row-per-ID truncation + plain count."""

import pandas as pd
import pytest

from tumult_analytics_spark import (
    AddRowsWithID,
    KeySet,
    MaxGroupsPerID,
    MaxRowsPerID,
    PureDPBudget,
    QueryBuilder,
    Session,
)

INF = PureDPBudget(float("inf"))


@pytest.fixture
def id_session(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "id": [1, 1, 1, 2, 2, 3, 3, 3, 3, 4],
                "g": ["a", "a", "b", "a", "b", "a", "a", "a", "b", "b"],
            }
        )
    )
    return Session.from_dataframe(INF, "t", df, AddRowsWithID("id"))


def test_global_distinct_ids_without_constraint(id_session):
    q = QueryBuilder("t").count_distinct(columns=["id"], name="n_ids")
    out = id_session.evaluate(q, INF)
    assert out.collect()[0]["n_ids"] == 4


def test_grouped_distinct_ids_with_max_groups(id_session):
    ks = KeySet.from_dict({"g": ["a", "b"]})
    q = (
        QueryBuilder("t")
        .enforce(MaxGroupsPerID("g", 2))
        .groupby(ks)
        .count_distinct(columns=["id"], name="n_ids")
    )
    out = id_session.evaluate(q, INF)
    got = {r["g"]: r["n_ids"] for r in out.collect()}
    # distinct ids per group: a -> {1,2,3}, b -> {1,2,3,4}
    assert got == {"a": 3, "b": 4}


def test_grouped_distinct_ids_without_max_groups_needs_constraint(id_session):
    ks = KeySet.from_dict({"g": ["a", "b"]})
    q = QueryBuilder("t").groupby(ks).count_distinct(columns=["id"])
    with pytest.raises(ValueError, match="constraint"):
        id_session.evaluate(q, INF)


def test_distinct_rows_still_requires_constraint(id_session):
    # Counting distinct full rows is NOT the optimized form.
    q = QueryBuilder("t").count_distinct()
    with pytest.raises(ValueError, match="constraint"):
        id_session.evaluate(q, INF)


def test_optimized_noise_scale_is_stability_one(id_session):
    # After the rewrite the query is a count at stability 1: noise
    # parameter must be d_in/epsilon = 1/2.
    q = QueryBuilder("t").count_distinct(columns=["id"])
    info = id_session._noise_info(q, PureDPBudget(2))
    assert info[0]["noise_parameter"] == pytest.approx(0.5)


def test_optimization_matches_unoptimized_path(id_session):
    # MaxRowsPerID present: both the optimized (ids-only) and plain
    # (all columns after truncation) paths are exact at infinite budget.
    q1 = QueryBuilder("t").enforce(MaxRowsPerID(4)).count_distinct(
        columns=["id"], name="n"
    )
    out = id_session.evaluate(q1, INF)
    assert out.collect()[0]["n"] == 4
