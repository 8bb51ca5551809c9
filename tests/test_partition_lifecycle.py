"""partition_and_create lifecycle semantics (reference session.py:1481-1482,
1729-1748: children used in creation order; using the parent or stop()
retires children), describe() constraint output, and the KeySetPlan
deferred algebra. Ports the behavioral shape of the reference's
test/system/session/ids/test_partition.py."""

import warnings

import pandas as pd
import pytest

from tumult_analytics_spark import (
    AddOneRow,
    ApproxDPBudget,
    KeySet,
    MaxRowsPerID,
    PureDPBudget,
    QueryBuilder,
    Session,
)
from tumult_analytics_spark.config import config


def _sess(spark, eps=10):
    df = spark.createDataFrame(
        pd.DataFrame({"a": ["0", "1", "1", "2"], "x": [1, 2, 3, 4]})
    )
    return Session.from_dataframe(PureDPBudget(eps), "t", df, AddOneRow())


def test_partition_budget_parallel_composition(spark):
    s = _sess(spark, eps=10)
    parts = s.partition_and_create(
        "t", PureDPBudget(4), "a", {"p0": "0", "p1": "1"}
    )
    # spent once from the parent; each child has the FULL amount
    assert float(s.remaining_privacy_budget.epsilon) == pytest.approx(6.0)
    for name in ("p0", "p1"):
        assert float(parts[name].remaining_privacy_budget.epsilon) == (
            pytest.approx(4.0)
        )


def test_children_in_order_no_warning(spark):
    s = _sess(spark)
    parts = s.partition_and_create(
        "t", PureDPBudget(2), "a", {"p0": "0", "p1": "1"}
    )
    with warnings.catch_warnings(record=True) as caught:
        # Record everything and assert specifically that no LIFECYCLE
        # warning fired: escalating all UserWarnings also trips on
        # unrelated library warnings during full-suite runs.
        warnings.simplefilter("always")
        out0 = parts["p0"].evaluate(QueryBuilder("p0").count(), PureDPBudget(1))
        # A noisy count at eps=1 can legitimately be negative — assert
        # the evaluation produced a row, not the noise's sign.
        assert out0.collect()[0]["count"] is not None
        parts["p0"].stop()
        out1 = parts["p1"].evaluate(QueryBuilder("p1").count(), PureDPBudget(1))
        assert out1.collect()[0]["count"] is not None
    lifecycle = [w for w in caught if "waiting for" in str(w.message)]
    assert not lifecycle, [str(w.message) for w in lifecycle]


def test_out_of_order_child_warns_and_retires_sibling(spark):
    s = _sess(spark)
    parts = s.partition_and_create(
        "t", PureDPBudget(2), "a", {"p0": "0", "p1": "1"}
    )
    with pytest.warns(UserWarning, match="waiting for one of its siblings"):
        parts["p1"].evaluate(QueryBuilder("p1").count(), PureDPBudget(1))
    # skipping p0 retired it
    with pytest.raises(RuntimeError, match="stopped"):
        parts["p0"].evaluate(QueryBuilder("p0").count(), PureDPBudget(1))


def test_parent_reuse_stops_children(spark):
    s = _sess(spark)
    parts = s.partition_and_create(
        "t", PureDPBudget(2), "a", {"p0": "0", "p1": "1"}
    )
    with pytest.warns(UserWarning, match="waiting for its children"):
        s.evaluate(QueryBuilder("t").count(), PureDPBudget(1))
    for name in ("p0", "p1"):
        with pytest.raises(RuntimeError, match="stopped"):
            parts[name].evaluate(QueryBuilder(name).count(), PureDPBudget(1))


def test_last_child_stop_reactivates_parent(spark):
    s = _sess(spark)
    parts = s.partition_and_create(
        "t", PureDPBudget(2), "a", {"p0": "0", "p1": "1"}
    )
    parts["p0"].stop()
    parts["p1"].stop()
    with warnings.catch_warnings():
        # Only escalate UserWarning (the lifecycle-warning category): a
        # blanket "error" filter also trips on unrelated ResourceWarnings
        # GC'd mid-block during full-suite runs.
        warnings.simplefilter("error", UserWarning)
        s.evaluate(QueryBuilder("t").count(), PureDPBudget(1))


def test_stop_cascades_to_children(spark):
    s = _sess(spark)
    parts = s.partition_and_create("t", PureDPBudget(2), "a", ["0", "1"])
    s.stop()
    for child in parts.values():
        with pytest.raises(RuntimeError, match="stopped"):
            child.evaluate(QueryBuilder("t").count(), PureDPBudget(1))


def test_describe_prints_constraints(spark, capsys):
    df = spark.createDataFrame(
        pd.DataFrame({"uid": [1, 1, 2], "g": ["a", "b", "a"]})
    )
    from tumult_analytics_spark import AddRowsWithID

    s = (
        Session.Builder()
        .with_privacy_budget(PureDPBudget(float("inf")))
        .with_id_space("ids")
        .with_private_dataframe("t", df, AddRowsWithID("uid", "ids"))
        .build()
    )
    s.create_view(QueryBuilder("t").enforce(MaxRowsPerID(2)), "v", cache=False)
    s.describe()
    out = capsys.readouterr().out
    assert "MaxRowsPerID" in out and "Constraints:" in out
    # tables without constraints are labelled like the reference
    assert "(no constraints)" in out
    s.describe("v")
    assert "MaxRowsPerID" in capsys.readouterr().out


def test_keyset_plan_algebra_resolves(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {"a": ["x", "x", "y", "z"], "b": [1, 2, 1, 9], "v": [1, 2, 3, 4]}
        )
    )
    budget = ApproxDPBudget(float("inf"), 1)
    s = Session.from_dataframe(budget, "t", df, AddOneRow())
    # detect b, cross with fixed a-domain, then filter the plan
    plan = (KeySet.from_dict({"a": ["x", "y"]}) * KeySet._detect(["b"])).filter(
        "b < 9"
    )
    out = s.evaluate(QueryBuilder("t").groupby(plan).count(), budget)
    got = {(r["a"], r["b"]): r["count"] for r in out.collect()}
    # detected b in {1, 2, 9}; filter drops 9; keyset = {x,y} x {1,2}
    assert got == {("x", 1): 1, ("x", 2): 1, ("y", 1): 1, ("y", 2): 0}
    # projecting away a detect column is refused (reference behavior)
    with pytest.raises(ValueError, match="project away"):
        (KeySet.from_dict({"a": ["x"]}) * KeySet._detect(["b"]))[["a"]]
    # join with a concrete keyset after detection: natural-join
    # intersection restricts the detected keys
    extra = KeySet.from_dict({"b": [1, 5]})
    plan2 = KeySet._detect(["b"]).join(extra)
    out2 = s.evaluate(QueryBuilder("t").groupby(plan2).count(), budget)
    got2 = {r["b"]: r["count"] for r in out2.collect()}
    # detected {1, 2, 9} joined with {1, 5} -> {1}
    assert got2 == {1: 2}
    # subtract after detection
    plan3 = KeySet._detect(["b"]) - KeySet.from_dict({"b": [9]})
    out3 = s.evaluate(QueryBuilder("t").groupby(plan3).count(), budget)
    assert {r["b"]: r["count"] for r in out3.collect()} == {1: 2, 2: 1}


def test_describe_query_prints_constraints(spark, capsys):
    from tumult_analytics_spark import AddRowsWithID

    df = spark.createDataFrame(
        pd.DataFrame({"uid": [1, 1, 2], "g": ["a", "b", "a"]})
    )
    s = (
        Session.Builder()
        .with_privacy_budget(PureDPBudget(float("inf")))
        .with_id_space("ids")
        .with_private_dataframe("t", df, AddRowsWithID("uid", "ids"))
        .build()
    )
    s.describe(QueryBuilder("t").enforce(MaxRowsPerID(2)))
    out = capsys.readouterr().out
    assert "Constraints:" in out and "MaxRowsPerID" in out
