"""Unit tests: KeySet algebra, BinningSpec semantics, noise distributions."""

import datetime
import math

import pandas as pd
import pytest

from tumult_analytics_spark import BinningSpec, KeySet
from tumult_analytics_spark.functions.noise import (
    _rng,
    _sample_discrete_gaussian,
    _sample_two_sided_geometric,
)


# --- KeySet ---------------------------------------------------------------


def test_from_dict_cross_product(spark):
    ks = KeySet.from_dict({"a": ["x", "y"], "b": [1, 2, 3]})
    assert ks.size() == 6
    assert ks.columns() == ("a", "b")
    rows = {tuple(r) for r in ks.dataframe().collect()}
    assert ("x", 1) in rows and ("y", 3) in rows


def test_from_tuples_dedup(spark):
    ks = KeySet.from_tuples([(1, "a"), (1, "a"), (2, "b")], ["n", "s"])
    assert ks.size() == 2


def test_cross_join_and_project(spark):
    k1 = KeySet.from_dict({"a": [1, 2]})
    k2 = KeySet.from_dict({"b": ["x", "y", "z"]})
    prod = k1 * k2
    assert prod.size() == 6
    proj = prod["a"]
    assert proj.size() == 2


def test_union_subtract_filter(spark):
    k1 = KeySet.from_dict({"a": [1, 2, 3]})
    k2 = KeySet.from_dict({"a": [3, 4]})
    assert (k1 | k2).size() == 4
    assert (k1 - k2).size() == 2
    assert k1.filter("a >= 2").size() == 2


def test_join_shared_columns(spark):
    k1 = KeySet.from_tuples([(1, "x"), (2, "y")], ["a", "b"])
    k2 = KeySet.from_tuples([(1, 10), (1, 20), (3, 30)], ["a", "c"])
    j = k1.join(k2)
    rows = {tuple(r) for r in j.dataframe().collect()}
    assert rows == {(1, "x", 10), (1, "x", 20)}


def test_keyset_equality(spark):
    k1 = KeySet.from_dict({"a": [1, 2]})
    k2 = KeySet.from_tuples([(2,), (1,)], ["a"])
    assert k1 == k2


def test_keyset_rejects_float(spark):
    with pytest.raises(ValueError):
        KeySet.from_dict({"a": [1.5]})


def test_in_memory_fast_path(spark):
    k = KeySet.from_dict({"a": list(range(100)), "b": list(range(100))})
    assert k.local_rows() is not None  # 10k < 2^20: driver-side
    assert k.size() == 10000
    big = KeySet.from_dict({"a": list(range(2000)), "b": list(range(2000))})
    assert big.local_rows() is None  # 4M > 2^20: Spark crossJoin


# --- BinningSpec ----------------------------------------------------------


def test_binning_default_labels():
    spec = BinningSpec([0, 5, 10])
    assert spec.bins() == ["[0, 5]", "(5, 10]"]
    assert spec(0) == "[0, 5]"
    assert spec(5) == "[0, 5]"
    assert spec(6) == "(5, 10]"
    assert spec(10) == "(5, 10]"
    assert spec(11) is None
    assert spec(None) is None


def test_binning_left_closed():
    spec = BinningSpec([0, 5, 10], right=False)
    assert spec(0) == "[0, 5)"
    assert spec(5) == "[5, 10]"
    assert spec(10) == "[5, 10]"  # include_both_endpoints
    assert spec(-1) is None


def test_binning_nan_bin():
    spec = BinningSpec([0.0, 1.0], nan_bin="NAN")
    assert spec(float("nan")) == "NAN"
    assert "NAN" in spec.bins()


def test_binning_float_label_precision():
    spec = BinningSpec([0.001, 0.002])
    assert spec.bins() == ["[0.001, 0.002]"]


def test_binning_spark_column_matches_python(spark):
    spec = BinningSpec([0, 10, 20, 30], names=["a", "b", "c"])
    vals = [-5, 0, 1, 10, 11, 20, 25, 30, 31, None]
    df = spark.createDataFrame([(v,) for v in vals], "x int")
    out = {
        r["x"]: r["bin"]
        for r in df.withColumn("bin", spec.to_column("x")).collect()
    }
    for v in vals:
        assert out[v] == spec(v), f"mismatch at {v}"


def test_binning_date_edges():
    d = datetime.date
    spec = BinningSpec([d(2020, 1, 1), d(2020, 6, 1), d(2021, 1, 1)])
    assert spec(d(2020, 3, 1)) == "[2020-01-01, 2020-06-01]"


# --- Noise samplers -------------------------------------------------------


def test_geometric_moments():
    b = 2.0
    s = _sample_two_sided_geometric(_rng(), b, 200_000)
    # Var of two-sided geometric with scale b: 2p'/(1-p')^2 where p'=e^{-1/b}
    p = math.exp(-1.0 / b)
    var = 2 * p / (1 - p) ** 2
    assert abs(s.mean()) < 0.05
    assert abs(s.var() / var - 1) < 0.05


def test_discrete_gaussian_moments():
    sigma_sq = 9.0
    s = _sample_discrete_gaussian(_rng(), sigma_sq, 200_000)
    assert abs(s.mean()) < 0.06
    assert abs(s.var() / sigma_sq - 1) < 0.05


def test_project_pushdown_across_crossjoin(spark):
    # 1500 x 1500 product exceeds the in-memory limit (2^20); projecting
    # one factor must never form the product — the result is the factor
    # itself, still driver-resident.
    big = KeySet.from_dict({"a": list(range(1500))}) * KeySet.from_dict(
        {"b": list(range(1500))}
    )
    projected = big["a"]
    rows = projected._op.local_rows()
    assert rows is not None and len(rows) == 1500
    assert projected.columns() == ("a",)


def test_project_pushdown_keeps_both_sides(spark):
    ks = KeySet.from_dict({"a": [1, 2]}) * KeySet.from_dict(
        {"b": ["x"], "c": ["y", "z"]}
    )
    out = ks[["c", "a"]]
    got = {tuple(r) for r in out.dataframe().collect()}
    assert got == {("y", 1), ("y", 2), ("z", 1), ("z", 2)}
    assert out.columns() == ("c", "a")


def test_project_plain_dedups(spark):
    ks = KeySet.from_tuples(
        [(1, "x"), (1, "y"), (2, "x")], columns=["a", "b"]
    )
    out = ks["a"]
    assert sorted(r["a"] for r in out.dataframe().collect()) == [1, 2]


def test_budget_algebra(spark):
    from fractions import Fraction

    from tumult_analytics_spark import ApproxDPBudget, PureDPBudget, RhoZCDPBudget

    assert PureDPBudget(1) + PureDPBudget(2) == PureDPBudget(3)
    assert PureDPBudget(3) - PureDPBudget(1) == PureDPBudget(2)
    assert PureDPBudget(1) / 3 * 3 == PureDPBudget(1)  # exact Fractions
    a = ApproxDPBudget(1, Fraction(1, 10)) * 2
    assert a == ApproxDPBudget(2, Fraction(1, 5))
    assert (ApproxDPBudget(1, Fraction(3, 4)) * 2).delta == 1  # delta capped
    assert RhoZCDPBudget(4) / 2 == RhoZCDPBudget(2)
    assert RhoZCDPBudget(2) * 2 == RhoZCDPBudget(4)
    assert PureDPBudget.inf().is_infinite()
    with pytest.raises(TypeError):
        PureDPBudget(1) + RhoZCDPBudget(1)
