"""Property-based tests (hypothesis): the DP relational core at infinite
budget must agree with pandas on randomly generated tables and keysets.
The reference has no property tests (SURVEY §5); these close that gap.

Examples are kept small and few — each example runs real Spark jobs."""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tumult_analytics_spark import (
    AddOneRow,
    KeySet,
    PureDPBudget,
    QueryBuilder,
    Session,
)

INF = PureDPBudget(float("inf"))

_GROUPS = ["a", "b", "c"]

rows_strategy = st.lists(
    st.tuples(
        st.sampled_from(_GROUPS + ["d"]),  # data may contain keys outside keyset
        st.integers(min_value=-100, max_value=100),
    ),
    min_size=0,
    max_size=30,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=rows_strategy)
def test_groupby_count_matches_pandas(spark, rows):
    df = spark.createDataFrame(rows or [("a", 0)], "g string, x long")
    if not rows:
        df = df.filter("1 = 0")
    s = Session.from_dataframe(INF, "t", df, AddOneRow())
    ks = KeySet.from_dict({"g": _GROUPS})
    out = s.evaluate(QueryBuilder("t").groupby(ks).count(), INF)
    got = {r["g"]: r["count"] for r in out.collect()}
    pdf = pd.DataFrame(rows, columns=["g", "x"])
    expected = {
        g: int((pdf["g"] == g).sum()) if len(pdf) else 0 for g in _GROUPS
    }
    assert got == expected


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=rows_strategy,
    low=st.integers(min_value=-50, max_value=0),
    high=st.integers(min_value=1, max_value=50),
)
def test_clamped_sum_matches_pandas(spark, rows, low, high):
    df = spark.createDataFrame(rows or [("a", 0)], "g string, x long")
    if not rows:
        df = df.filter("1 = 0")
    s = Session.from_dataframe(INF, "t", df, AddOneRow())
    ks = KeySet.from_dict({"g": _GROUPS})
    out = s.evaluate(
        QueryBuilder("t").groupby(ks).sum("x", low, high, name="s"), INF
    )
    got = {r["g"]: r["s"] for r in out.collect()}
    pdf = pd.DataFrame(rows, columns=["g", "x"])
    expected = {}
    for g in _GROUPS:
        sub = pdf[pdf["g"] == g]["x"].clip(low, high) if len(pdf) else []
        expected[g] = int(pd.Series(sub).sum()) if len(sub) else 0
    assert got == expected
