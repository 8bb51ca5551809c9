"""L0/L-inf truncation parity with the reference's own ids suite
(``test/system/session/ids/test_l0_linf_truncation.py:27-116`` and fixture
``test/system/conftest.py:37-53``): for each (MaxGroupsPerID,
MaxRowsPerGroupPerID) pair the truncated value-set must be one of the
reference's admissible outcomes (truncation picks a deterministic but
hash-dependent subset), under both PureDP and zCDP."""

import pandas as pd
import pytest

from tumult_analytics_spark import (
    AddRowsWithID,
    KeySet,
    MaxGroupsPerID,
    MaxRowsPerGroupPerID,
    PureDPBudget,
    QueryBuilder,
    RhoZCDPBudget,
    Session,
)

INF = PureDPBudget(float("inf"))
INF_ZCDP = RhoZCDPBudget(float("inf"))

# reference test/system/conftest.py:39-52 (table id_a1)
_ROWS = [
    [1, "A", "X", 4, 4.0],
    [1, "A", "Y", 5, 5.0],
    [1, "A", "X", 6, 6.0],
    [2, "A", "Y", 7, 7.0],
    [3, "A", "X", 8, 8.0],
    [3, "B", "Y", 9, 9.0],
]

# reference test_l0_linf_truncation.py:34-77
_CASES = [
    # (max_groups, rows_per_group, admissible grouped outcomes)
    (1, 1, {((4, 7, 8), ()), ((5, 7, 8), ()), ((6, 7, 8), ()),
            ((4, 7), (9,)), ((5, 7), (9,)), ((6, 7), (9,))}),
    (2, 1, {((4, 7, 8), (9,)), ((5, 7, 8), (9,)), ((6, 7, 8), (9,))}),
    (1, 2, {((4, 5, 7, 8), ()), ((4, 6, 7, 8), ()), ((5, 6, 7, 8), ()),
            ((4, 5, 7), (9,)), ((4, 6, 7), (9,)), ((5, 6, 7), (9,))}),
    (2, 2, {((4, 5, 7, 8), (9,)), ((4, 6, 7, 8), (9,)), ((5, 6, 7, 8), (9,))}),
    (1, 3, {((4, 5, 6, 7, 8), ()), ((4, 5, 6, 7), (9,))}),
    (2, 3, {((4, 5, 6, 7, 8), (9,))}),
]

_KS = KeySet.from_dict({"group": ["A", "B"]})


@pytest.fixture(scope="module", params=["puredp", "zcdp"])
def id_session(spark, request):
    df = spark.createDataFrame(
        pd.DataFrame(_ROWS, columns=["id", "group", "group2", "n", "float_n"])
    )
    budget = INF if request.param == "puredp" else INF_ZCDP
    return Session.from_dataframe(budget, "id_a1", df, AddRowsWithID("id")), budget


def _base(max_groups, rows_per_group):
    return (
        QueryBuilder("id_a1")
        .enforce(MaxGroupsPerID("group", max_groups))
        .enforce(MaxRowsPerGroupPerID("group", rows_per_group))
    )


@pytest.mark.parametrize("max_groups,rows_per_group,outcomes", _CASES)
def test_count_after_truncation(id_session, max_groups, rows_per_group, outcomes):
    s, budget = id_session
    res = s.evaluate(_base(max_groups, rows_per_group).count(), budget)
    got = res.collect()[0]["count"]
    admissible_counts = {len(a) + len(b) for a, b in outcomes}
    assert got in admissible_counts, (got, admissible_counts)


@pytest.mark.parametrize("max_groups,rows_per_group,outcomes", _CASES)
def test_grouped_count_after_truncation(
    id_session, max_groups, rows_per_group, outcomes
):
    s, budget = id_session
    res = s.evaluate(_base(max_groups, rows_per_group).groupby(_KS).count(), budget)
    got = {r["group"]: r["count"] for r in res.collect()}
    admissible = {(len(a), len(b)) for a, b in outcomes}
    assert (got["A"], got["B"]) in admissible, (got, admissible)


@pytest.mark.parametrize("max_groups,rows_per_group,outcomes", _CASES)
def test_grouped_sum_after_truncation(
    id_session, max_groups, rows_per_group, outcomes
):
    s, budget = id_session
    res = s.evaluate(
        _base(max_groups, rows_per_group).groupby(_KS).sum("n", 0, 10, name="s"),
        budget,
    )
    got = {r["group"]: r["s"] for r in res.collect()}
    admissible = {(sum(a), sum(b)) for a, b in outcomes}
    assert (got["A"], got["B"]) in admissible, (got, admissible)


# --- L1 (MaxRowsPerID) cases: reference test_l1_truncation.py:25-80 --------

_L1_CASES = [
    (1, {((4, 7, 8), ()), ((5, 7, 8), ()), ((6, 7, 8), ()),
         ((4, 7), (9,)), ((5, 7), (9,)), ((6, 7), (9,))}),
    (2, {((4, 5, 7, 8), (9,)), ((4, 6, 7, 8), (9,)), ((5, 6, 7, 8), (9,))}),
    (3, {((4, 5, 6, 7, 8), (9,))}),
]


@pytest.mark.parametrize("max_rows,outcomes", _L1_CASES)
def test_l1_count(id_session, max_rows, outcomes):
    from tumult_analytics_spark import MaxRowsPerID

    s, budget = id_session
    q = QueryBuilder("id_a1").enforce(MaxRowsPerID(max_rows)).count()
    got = s.evaluate(q, budget).collect()[0]["count"]
    assert got in {len(a) + len(b) for a, b in outcomes}


@pytest.mark.parametrize("max_rows,outcomes", _L1_CASES)
def test_l1_grouped_count(id_session, max_rows, outcomes):
    from tumult_analytics_spark import MaxRowsPerID

    s, budget = id_session
    q = (
        QueryBuilder("id_a1")
        .enforce(MaxRowsPerID(max_rows))
        .groupby(_KS)
        .count()
    )
    got = {r["group"]: r["count"] for r in s.evaluate(q, budget).collect()}
    assert (got["A"], got["B"]) in {(len(a), len(b)) for a, b in outcomes}


@pytest.mark.parametrize("max_rows", [1, 2, 3])
def test_l1_count_distinct_ids(id_session, max_rows):
    from tumult_analytics_spark import MaxRowsPerID

    s, budget = id_session
    q = (
        QueryBuilder("id_a1")
        .enforce(MaxRowsPerID(max_rows))
        .count_distinct(["id"], name="n")
    )
    # 3 distinct IDs regardless of truncation level
    assert s.evaluate(q, budget).collect()[0]["n"] == 3


@pytest.mark.parametrize("max_groups,rows_per_group,outcomes", _CASES)
def test_grouped_average_after_truncation(
    id_session, max_groups, rows_per_group, outcomes
):
    s, budget = id_session
    res = s.evaluate(
        _base(max_groups, rows_per_group)
        .groupby(_KS)
        .average("n", 0, 10, name="avg"),
        budget,
    )
    got = {r["group"]: r["avg"] for r in res.collect()}
    mid = 5.0  # empty-group average = bounds midpoint
    admissible = set()
    for a, b in outcomes:
        ga = sum(a) / len(a) if a else mid
        gb = sum(b) / len(b) if b else mid
        admissible.add((round(ga, 6), round(gb, 6)))
    assert (round(got["A"], 6), round(got["B"], 6)) in admissible, (
        got,
        admissible,
    )
