"""Special-values matrix: null / NaN / +-inf interaction with every
aggregation, mirroring the reference's
``test/system/session/test_special_values.py`` (951 LoC) semantics:

- count counts every row, including all-special rows;
- count_distinct treats null and NaN as distinct values;
- sum/average/variance/stdev/quantile DROP null/NaN rows in the measure
  column (the rewrite splices DropNullAndNan) and CLAMP +-inf to the
  aggregation bounds (ReplaceInfinity);
- get_bounds drops infinities instead of clamping;
- drop_null_and_nan / drop_infinity / replace_* explicitly control the
  same behavior ahead of the aggregation.
"""

import math

import pandas as pd
import pytest

from tumult_analytics_spark import (
    AddOneRow,
    KeySet,
    PureDPBudget,
    QueryBuilder,
    Session,
)

INF = PureDPBudget(float("inf"))

NAN = float("nan")
PINF = float("inf")
NINF = float("-inf")


@pytest.fixture(scope="module")
def sess(spark):
    # NB: not via pandas — pandas silently turns None into NaN in float
    # columns; a real SQL NULL needs an explicit Spark schema.
    df = spark.createDataFrame(
        [
            ("a", 1.0),
            ("a", 2.0),
            ("a", NAN),
            ("a", PINF),
            ("a", NINF),
            ("b", 4.0),
            ("b", None),
            (None, 8.0),
        ],
        "g string, x double",
    )
    return Session.from_dataframe(INF, "sv", df, AddOneRow())


def _one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


def test_count_includes_special_rows(sess):
    assert _one(sess.evaluate(QueryBuilder("sv").count(), INF))["count"] == 8


def test_count_distinct_nulls_and_nans_are_values(sess):
    # distinct x values: 1, 2, NaN, inf, -inf, 4, null, 8 -> 8
    q = QueryBuilder("sv").count_distinct(columns=["x"], name="n")
    assert _one(sess.evaluate(q, INF))["n"] == 8


def test_sum_drops_null_nan_clamps_inf(sess):
    # kept: 1, 2, inf->10, -inf->0, 4, 8 -> 25
    q = QueryBuilder("sv").sum("x", 0.0, 10.0, name="s")
    assert _one(sess.evaluate(q, INF))["s"] == pytest.approx(25.0)


def test_average_drops_null_nan_clamps_inf(sess):
    q = QueryBuilder("sv").average("x", 0.0, 10.0, name="m")
    assert _one(sess.evaluate(q, INF))["m"] == pytest.approx(25.0 / 6)


def test_variance_special_values(sess):
    vals = [1.0, 2.0, 10.0, 0.0, 4.0, 8.0]
    n = len(vals)
    mean = sum(vals) / n
    var = sum((v - mean) ** 2 for v in vals) / (n - 1)
    q = QueryBuilder("sv").variance("x", 0.0, 10.0, name="v")
    assert _one(sess.evaluate(q, INF))["v"] == pytest.approx(var)


def test_quantile_drops_specials(sess):
    q = QueryBuilder("sv").median("x", 0.0, 10.0, name="med")
    med = _one(sess.evaluate(q, INF))["med"]
    assert 0.0 <= med <= 10.0 and not math.isnan(med)


def test_groupby_with_null_key(sess):
    # Null IS a valid group key (null-safe joins throughout).
    ks = KeySet.from_tuples([("a",), ("b",), (None,)], ["g"])
    q = QueryBuilder("sv").groupby(ks).count()
    got = {r["g"]: r["count"] for r in sess.evaluate(q, INF).collect()}
    assert got == {"a": 5, "b": 2, None: 1}


def test_explicit_drop_null_and_nan(sess):
    q = QueryBuilder("sv").drop_null_and_nan(["x"]).count()
    assert _one(sess.evaluate(q, INF))["count"] == 6


def test_explicit_drop_infinity(sess):
    q = QueryBuilder("sv").drop_infinity(["x"]).count()
    assert _one(sess.evaluate(q, INF))["count"] == 6


def test_explicit_replace_infinity_then_sum(sess):
    # replace ±inf with (lo=-5, hi=5): values 1,2,5,-5,4,8 (null/NaN
    # still dropped by the rewrite) -> clamp to (0,10): 1+2+5+0+4+8=20
    q = (
        QueryBuilder("sv")
        .replace_infinity({"x": (-5.0, 5.0)})
        .sum("x", 0.0, 10.0, name="s")
    )
    assert _one(sess.evaluate(q, INF))["s"] == pytest.approx(20.0)


def test_replace_null_and_nan_then_count_distinct(sess):
    # null and NaN both -> 0.0; distinct: {1,2,0,inf,-inf,4,8} = 7
    q = (
        QueryBuilder("sv")
        .replace_null_and_nan({"x": 0.0})
        .count_distinct(columns=["x"], name="n")
    )
    assert _one(sess.evaluate(q, INF))["n"] == 7


def test_get_bounds_ignores_infinities(sess):
    q = QueryBuilder("sv").get_bounds("x", "lo", "hi")
    row = _one(sess.evaluate(q, INF))
    assert not math.isinf(row["lo"]) and not math.isinf(row["hi"])
    assert row["lo"] <= 1.0 and row["hi"] >= 8.0
