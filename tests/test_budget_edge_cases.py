"""Budget edge-case system tests, ported from the reference's
test/system/session/test_budgets.py:22-97: every (session budget, query
budget) combination there must evaluate without error — slight float
overdraft is absorbed by the relative tolerance (budget.py:21), inf
session budgets accept any request, ApproxDP sessions accept PureDP
query budgets (coerced to (eps, 0)), and delta=1 makes an ApproxDP
budget infinite.
"""

import sys

import pandas as pd
import pytest

from tumult_analytics_spark import (
    AddOneRow,
    AddRowsWithID,
    ApproxDPBudget,
    MaxRowsPerID,
    PureDPBudget,
    QueryBuilder,
    RhoZCDPBudget,
    Session,
)

FMAX = sys.float_info.max

CASES = [
    (PureDPBudget(2), PureDPBudget(2.000000001)),
    (PureDPBudget(2), PureDPBudget(1.999999999)),
    (PureDPBudget(2.000000001), PureDPBudget(2)),
    (PureDPBudget(1.999999999), PureDPBudget(2)),
    (PureDPBudget(FMAX), PureDPBudget(0.1)),
    (PureDPBudget(FMAX), PureDPBudget(FMAX)),
    (PureDPBudget(float("inf")), PureDPBudget(1)),
    (PureDPBudget(float("inf")), PureDPBudget(1.5)),
    (PureDPBudget(float("inf")), PureDPBudget(float("inf"))),
    (RhoZCDPBudget(2), RhoZCDPBudget(2.000000001)),
    (RhoZCDPBudget(2), RhoZCDPBudget(1.999999999)),
    (RhoZCDPBudget(2.000000001), RhoZCDPBudget(2)),
    (RhoZCDPBudget(1.999999999), RhoZCDPBudget(2)),
    (RhoZCDPBudget(FMAX), RhoZCDPBudget(0.1)),
    (RhoZCDPBudget(FMAX), RhoZCDPBudget(FMAX)),
    (RhoZCDPBudget(float("inf")), RhoZCDPBudget(1)),
    (RhoZCDPBudget(float("inf")), RhoZCDPBudget(1.5)),
    (RhoZCDPBudget(float("inf")), RhoZCDPBudget(float("inf"))),
    (ApproxDPBudget(2, 0.1), ApproxDPBudget(2.000000001, 0.1)),
    (ApproxDPBudget(2, 0.1), ApproxDPBudget(1.999999999, 0.1)),
    (ApproxDPBudget(2.000000001, 0.1), ApproxDPBudget(2, 0.1)),
    (ApproxDPBudget(1.999999999, 0.1), ApproxDPBudget(2, 0.1)),
    (ApproxDPBudget(FMAX, 0.1), ApproxDPBudget(0.1, 0.1)),
    (ApproxDPBudget(FMAX, 0.1), ApproxDPBudget(FMAX, 0.1)),
    (ApproxDPBudget(1, 1), ApproxDPBudget(1, 0.1)),
    (ApproxDPBudget(1, 1), ApproxDPBudget(1.5, 0.1)),
    (ApproxDPBudget(1, 1), ApproxDPBudget(1.5, 1)),
    (ApproxDPBudget(1, 1), ApproxDPBudget(float("inf"), 0.1)),
    (ApproxDPBudget(1, 1), ApproxDPBudget(float("inf"), 1)),
    (ApproxDPBudget(float("inf"), 0.1), ApproxDPBudget(1, 0.1)),
    (ApproxDPBudget(float("inf"), 0.1), ApproxDPBudget(1.5, 0.1)),
    (ApproxDPBudget(float("inf"), 0.1), ApproxDPBudget(1.5, 1)),
    (ApproxDPBudget(float("inf"), 0.1), ApproxDPBudget(float("inf"), 0.1)),
    (ApproxDPBudget(float("inf"), 0.1), ApproxDPBudget(float("inf"), 1)),
    (ApproxDPBudget(float("inf"), 1), ApproxDPBudget(1, 0.1)),
    (ApproxDPBudget(float("inf"), 1), ApproxDPBudget(1.5, 0.1)),
    (ApproxDPBudget(float("inf"), 1), ApproxDPBudget(1.5, 1)),
    (ApproxDPBudget(float("inf"), 1), ApproxDPBudget(float("inf"), 0.1)),
    (ApproxDPBudget(float("inf"), 1), ApproxDPBudget(float("inf"), 1)),
    (ApproxDPBudget(2, 0.1), PureDPBudget(2.000000001)),
    (ApproxDPBudget(2, 0.1), PureDPBudget(1.999999999)),
    (ApproxDPBudget(2.000000001, 0.1), PureDPBudget(2)),
    (ApproxDPBudget(1.999999999, 0.1), PureDPBudget(2)),
    (ApproxDPBudget(float("inf"), 0.1), PureDPBudget(2)),
    (ApproxDPBudget(1, 1), PureDPBudget(2)),
    (ApproxDPBudget(float("inf"), 0.1), PureDPBudget(float("inf"))),
    (ApproxDPBudget(1, 1), PureDPBudget(float("inf"))),
]


def _ids(case):
    s, q = case
    return f"{s!r}->{q!r}"


@pytest.fixture(scope="module")
def rows_df(spark):
    return spark.createDataFrame(
        pd.DataFrame({"A": ["a", "b", "a", "c"], "X": [1, 2, 3, 4]})
    )


@pytest.fixture(scope="module")
def ids_df(spark):
    return spark.createDataFrame(
        pd.DataFrame({"uid": [1, 1, 2, 3, 3, 3], "n": [1, 2, 3, 4, 5, 6]})
    )


@pytest.mark.parametrize("case", CASES, ids=_ids)
def test_count_with_unusual_budgets(case, rows_df):
    session_budget, query_budget = case
    sess = Session.from_dataframe(session_budget, "rows_1", rows_df, AddOneRow())
    out = sess.evaluate(QueryBuilder("rows_1").count(), query_budget)
    assert out.count() == 1


# The reference marks the remaining query shapes slow and runs them on a
# subset nightly; here a representative sample keeps the suite fast while
# still exercising sum and the IDs-truncation path against the edge
# budgets (overdraft tolerance, inf, cross-kind coercion).
SAMPLE = [
    CASES[0],   # PureDP slight overdraft
    CASES[8],   # PureDP inf/inf
    CASES[9],   # zCDP slight overdraft
    CASES[18],  # ApproxDP slight overdraft
    CASES[39],  # PureDP query on ApproxDP session (overdraft)
    CASES[46],  # PureDP inf query on delta=1 session
]


@pytest.mark.parametrize("case", SAMPLE, ids=_ids)
def test_sum_with_unusual_budgets(case, rows_df):
    session_budget, query_budget = case
    sess = Session.from_dataframe(session_budget, "rows_1", rows_df, AddOneRow())
    out = sess.evaluate(QueryBuilder("rows_1").sum("X", 0, 10), query_budget)
    assert out.count() == 1


@pytest.mark.parametrize("case", SAMPLE, ids=_ids)
def test_ids_enforce_with_unusual_budgets(case, ids_df):
    session_budget, query_budget = case
    sess = Session.from_dataframe(
        session_budget, "id_a1", ids_df, AddRowsWithID("uid")
    )
    q = QueryBuilder("id_a1").enforce(MaxRowsPerID(2)).count()
    out = sess.evaluate(q, query_budget)
    assert out.count() == 1


def test_overdraft_leaves_zero_remaining(rows_df):
    sess = Session.from_dataframe(PureDPBudget(2), "rows_1", rows_df, AddOneRow())
    sess.evaluate(QueryBuilder("rows_1").count(), PureDPBudget(2.000000001))
    assert sess.remaining_privacy_budget == PureDPBudget(0)


def test_clear_overspend_still_raises(rows_df):
    sess = Session.from_dataframe(PureDPBudget(2), "rows_1", rows_df, AddOneRow())
    with pytest.raises(RuntimeError, match="exceeding the Session privacy budget"):
        sess.evaluate(QueryBuilder("rows_1").count(), PureDPBudget(3))


def test_approxdp_delta_accounting_across_queries(rows_df):
    # Laplace-family queries satisfy (eps, 0)-DP, so composed counts
    # consume only epsilon (delta-zeroing, reference
    # _base_measurement_visitor.py:591-668); partition selection
    # (get_groups) genuinely consumes delta. After the counts delta is
    # intact; after get_groups it is gone and a further delta request
    # fails even though epsilon remains.
    sess = Session.from_dataframe(
        ApproxDPBudget(10, 0.1), "rows_1", rows_df, AddOneRow()
    )
    sess.evaluate(QueryBuilder("rows_1").count(), ApproxDPBudget(1, 0.06))
    sess.evaluate(QueryBuilder("rows_1").count(), ApproxDPBudget(1, 0.04))
    rem = sess.remaining_privacy_budget
    assert rem.epsilon == 8 and rem.delta == ApproxDPBudget(10, 0.1).delta
    sess.evaluate(
        QueryBuilder("rows_1").get_groups(["A"]), ApproxDPBudget(1, 0.1)
    )
    rem = sess.remaining_privacy_budget
    assert rem.epsilon == 7 and rem.delta == 0
    with pytest.raises(RuntimeError):
        sess.evaluate(
            QueryBuilder("rows_1").get_groups(["A"]), ApproxDPBudget(1, 0.05)
        )
