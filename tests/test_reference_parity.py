"""Golden-output parity with the reference's own system tests.

Each case re-expresses an entry of EVALUATE_TESTS from the reference
(``test/system/session/rows/conftest.py:62-650``) against THIS engine at
infinite budget, asserting the reference's exact expected DataFrame —
fixtures included (``rows/conftest.py:655-710``: sdf = A:VARCHAR B:INTEGER
X:INTEGER, 4 rows; join/public tables)."""

import datetime

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

_DATE1 = datetime.date(2022, 1, 1)
_DATE2 = datetime.date(2022, 1, 2)


@pytest.fixture(scope="module")
def sess(spark):
    sdf = spark.createDataFrame(
        [["0", 0, 0], ["0", 0, 1], ["0", 1, 2], ["1", 0, 3]],
        "A string, B long, X long",
    )
    join_df = spark.createDataFrame(
        [["0", 0], ["0", 1], ["1", 1], ["1", 2]], "A string, `A+B` long"
    )
    join_dtypes_df = spark.createDataFrame(
        [[0, _DATE1], [1, _DATE1], [2, _DATE1], [3, _DATE2]], "X long, DATE date"
    )
    s = (
        Session.Builder()
        .with_privacy_budget(INF)
        .with_private_dataframe("private", sdf, AddOneRow())
        .with_public_dataframe("public", join_df)
        .with_public_dataframe("join_dtypes", join_dtypes_df)
        .build()
    )
    return s


def _got(sess, query, sort_cols):
    df = sess.evaluate(query, INF).toPandas()
    return (
        df.sort_values(sort_cols).reset_index(drop=True)
        if sort_cols
        else df.reset_index(drop=True)
    )


def _expect(got, expected_pdf, sort_cols):
    exp = (
        expected_pdf.sort_values(sort_cols).reset_index(drop=True)
        if sort_cols
        else expected_pdf.reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[exp.columns], exp, check_dtype=False)


def test_total_count(sess):  # conftest.py:63-71
    _expect(
        _got(sess, QueryBuilder("private").count(name="total"), None),
        pd.DataFrame({"total": [4]}),
        None,
    )


def test_total_count_distinct(sess):  # conftest.py:73-81
    _expect(
        _got(sess, QueryBuilder("private").count_distinct(name="total"), None),
        pd.DataFrame({"total": [4]}),
        None,
    )


def test_count_laplace_mechanism(sess):  # conftest.py:83-91
    _expect(
        _got(
            sess,
            QueryBuilder("private").count(name="total", mechanism="laplace"),
            None,
        ),
        pd.DataFrame({"total": [4]}),
        None,
    )


def test_full_marginal(sess):  # conftest.py:106-119
    q = (
        QueryBuilder("private")
        .groupby(KeySet.from_dict({"A": ["0", "1"], "B": [0, 1]}))
        .count()
    )
    _expect(
        _got(sess, q, ["A", "B"]),
        pd.DataFrame(
            {"A": ["0", "0", "1", "1"], "B": [0, 1, 0, 1], "count": [2, 1, 1, 0]}
        ),
        ["A", "B"],
    )


def test_incomplete_marginal_from_dataframe(sess, spark):  # conftest.py:134-143
    ks = KeySet.from_dataframe(
        spark.createDataFrame([["0", 0], ["0", 1], ["1", 1]], "A string, B long")
    )
    q = QueryBuilder("private").groupby(ks).count()
    _expect(
        _got(sess, q, ["A", "B"]),
        pd.DataFrame({"A": ["0", "0", "1"], "B": [0, 1, 1], "count": [2, 1, 0]}),
        ["A", "B"],
    )


def test_marginal_with_additional_value(sess):  # conftest.py:156-165
    q = (
        QueryBuilder("private")
        .groupby(KeySet.from_dict({"A": ["0", "1", "2"]}))
        .count()
    )
    _expect(
        _got(sess, q, ["A"]),
        pd.DataFrame({"A": ["0", "1", "2"], "count": [3, 1, 0]}),
        ["A"],
    )


def test_marginal_with_duplicate_keyset_rows(sess, spark):  # conftest.py:178-187
    ks = KeySet.from_dataframe(
        spark.createDataFrame(
            [["0"], ["0"], ["1"], ["1"], ["2"], ["2"]], "A string"
        )
    )
    q = QueryBuilder("private").groupby(ks).count()
    _expect(
        _got(sess, q, ["A"]),
        pd.DataFrame({"A": ["0", "1", "2"], "count": [3, 1, 0]}),
        ["A"],
    )


def test_bounded_sum(sess):  # conftest.py:212-225
    q = (
        QueryBuilder("private")
        .groupby(KeySet.from_dict({"A": ["0", "1"]}))
        .sum(column="X", low=0, high=1, name="sum")
    )
    _expect(
        _got(sess, q, ["A"]),
        pd.DataFrame({"A": ["0", "1"], "sum": [2, 1]}),
        ["A"],
    )


def test_flat_map_duplicating_rows(sess):  # conftest.py:226-249
    q = (
        QueryBuilder("private")
        .flat_map(
            f=lambda _: [{}, {}], max_rows=2, new_column_types={}, augment=True
        )
        .replace_null_and_nan()
        .sum(column="X", low=0, high=3)
    )
    _expect(
        _got(sess, q, None), pd.DataFrame({"X_sum": [12]}), None
    )


def test_nested_flat_maps(sess):  # conftest.py:250-292
    q = (
        QueryBuilder("private")
        .flat_map(
            f=lambda row: [{"Repeat": 1 if row["A"] == "0" else 2}],
            max_rows=1,
            new_column_types={"Repeat": "INTEGER"},
            augment=True,
        )
        .flat_map(
            f=lambda row: [{"i": row["X"]} for _ in range(row["Repeat"])],
            max_rows=2,
            new_column_types={"i": "INTEGER"},
            augment=False,
        )
        .replace_null_and_nan()
        .sum(column="i", low=0, high=3)
    )
    _expect(_got(sess, q, None), pd.DataFrame({"i_sum": [9]}), None)


def test_grouping_flat_map_sum(sess):  # conftest.py:293-335
    q = (
        QueryBuilder("private")
        .flat_map(
            f=lambda row: [{"Repeat": 1 if row["A"] == "0" else 2}],
            max_rows=1,
            new_column_types={"Repeat": "INTEGER"},
            augment=True,
            grouping=True,
        )
        .flat_map(
            f=lambda row: [{"i": row["X"]} for _ in range(row["Repeat"])],
            max_rows=2,
            new_column_types={"i": "INTEGER"},
            augment=True,
        )
        .replace_null_and_nan()
        .groupby(KeySet.from_dict({"Repeat": [1, 2]}))
        .sum(column="i", low=0, high=3)
    )
    _expect(
        _got(sess, q, ["Repeat"]),
        pd.DataFrame({"Repeat": [1, 2], "i_sum": [3, 6]}),
        ["Repeat"],
    )


def test_public_join_count_by_date(sess):  # conftest.py:543-564
    q = (
        QueryBuilder("private")
        .join_public("join_dtypes")
        .groupby(KeySet.from_dict({"DATE": [_DATE1, _DATE2]}))
        .count()
    )
    _expect(
        _got(sess, q, ["DATE"]),
        pd.DataFrame({"DATE": [_DATE1, _DATE2], "count": [3, 1]}),
        ["DATE"],
    )


def test_public_join_count_distinct_dates(sess):  # conftest.py:565-578
    q = (
        QueryBuilder("private")
        .join_public("join_dtypes")
        .count_distinct(columns=["DATE"])
    )
    got = _got(sess, q, None)
    assert list(got.columns) == ["count_distinct(DATE)"]
    assert got["count_distinct(DATE)"][0] == 2


def test_public_join_disambiguation(sess):  # conftest.py:579-625
    q = (
        QueryBuilder("private")
        .join_public("public")
        .join_public("public", ["A"])
        .join_public("public", ["A"])
        .groupby(
            KeySet.from_dict(
                {"A+B": [0, 1, 2], "A+B_left": [0, 1, 2], "A+B_right": [0, 1, 2]}
            )
        )
        .count()
    )
    expected = pd.DataFrame(
        [
            (0, 0, 0, 3), (0, 0, 1, 3), (0, 1, 0, 3), (0, 1, 1, 3),
            (1, 0, 0, 3), (1, 0, 1, 3), (1, 1, 0, 3), (1, 1, 1, 4),
            (1, 1, 2, 1), (1, 2, 1, 1), (1, 2, 2, 1), (2, 1, 1, 1),
            (2, 1, 2, 1), (2, 2, 1, 1), (2, 2, 2, 1), (0, 0, 2, 0),
            (0, 1, 2, 0), (0, 2, 0, 0), (0, 2, 1, 0), (0, 2, 2, 0),
            (1, 0, 2, 0), (1, 2, 0, 0), (2, 0, 0, 0), (2, 0, 1, 0),
            (2, 0, 2, 0), (2, 1, 0, 0), (2, 2, 0, 0),
        ],
        columns=["A+B", "A+B_left", "A+B_right", "count"],
    )
    cols = ["A+B", "A+B_left", "A+B_right"]
    _expect(_got(sess, q, cols), expected, cols)


def test_suppress_aggregates(sess):  # conftest.py:626-650
    q = (
        QueryBuilder("private")
        .groupby(KeySet.from_dict({"A": ["0", "1"], "B": [0, 1]}))
        .count()
        .suppress(1)
    )
    _expect(
        _got(sess, q, ["A", "B"]),
        pd.DataFrame(
            [["0", 0, 2], ["0", 1, 1], ["1", 0, 1]], columns=["A", "B", "count"]
        ),
        ["A", "B"],
    )


def test_bin_column_left_closed(sess):  # conftest.py:385-392
    from tumult_analytics_spark import BinningSpec

    q = (
        QueryBuilder("private")
        .bin_column(
            "X", BinningSpec([0, 2, 4], names=["0,1", "2,3"], right=False)
        )
        .groupby(KeySet.from_dict({"X_binned": ["0,1", "2,3"]}))
        .count()
    )
    _expect(
        _got(sess, q, ["X_binned"]),
        pd.DataFrame({"X_binned": ["0,1", "2,3"], "count": [2, 2]}),
        ["X_binned"],
    )


def test_histogram_syntax(sess):  # conftest.py:393-399
    from tumult_analytics_spark import BinningSpec

    q = QueryBuilder("private").histogram(
        "X", BinningSpec([0, 2, 4], names=["0,1", "2,3"], right=False)
    )
    _expect(
        _got(sess, q, ["X_binned"]),
        pd.DataFrame({"X_binned": ["0,1", "2,3"], "count": [2, 2]}),
        ["X_binned"],
    )


def test_binning_nulls_out_of_range(sess):  # conftest.py:400-413
    from tumult_analytics_spark import BinningSpec

    q = (
        QueryBuilder("private")
        .map(
            lambda row: {"X": row["X"] if row["X"] != 3 else None},
            new_column_types={"X": "INTEGER"},
        )
        .bin_column(
            "X", BinningSpec([10, 12, 14], names=["10,12", "12,14"], right=False)
        )
        .groupby(KeySet.from_dict({"X_binned": ["10,12", "12,14", None]}))
        .count()
    )
    got = _got(sess, q, None)
    got_map = {r["X_binned"]: r["count"] for _, r in got.iterrows()}
    assert got_map == {"10,12": 0, "12,14": 0, None: 4}


def test_filter_count_and_distinct(sess):  # conftest.py:431-447
    _expect(
        _got(sess, QueryBuilder("private").filter("A == '0'").count(), None),
        pd.DataFrame({"count": [3]}),
        None,
    )
    _expect(
        _got(
            sess, QueryBuilder("private").filter("A == '0'").count_distinct(), None
        ),
        pd.DataFrame({"count_distinct": [3]}),
        None,
    )


def test_select_count_and_distinct(sess):  # conftest.py:448-464
    _expect(
        _got(sess, QueryBuilder("private").select(["A"]).count(), None),
        pd.DataFrame({"count": [4]}),
        None,
    )
    _expect(
        _got(
            sess, QueryBuilder("private").select(["A"]).count_distinct(), None
        ),
        pd.DataFrame({"count_distinct": [2]}),
        None,
    )


def test_map_then_grouped_count(sess):  # conftest.py:465-491
    q = (
        QueryBuilder("private")
        .map(
            f=lambda row: {"C": 2 * str(row["B"])},
            new_column_types={"C": "VARCHAR"},
            augment=True,
        )
        .replace_null_and_nan()
        .groupby(KeySet.from_dict({"A": ["0", "1"], "C": ["00", "11"]}))
        .count()
    )
    _expect(
        _got(sess, q, ["A", "C"]),
        pd.DataFrame(
            [["0", "00", 2], ["0", "11", 1], ["1", "00", 1], ["1", "11", 0]],
            columns=["A", "C", "count"],
        ),
        ["A", "C"],
    )


def test_join_public_inner_and_left(sess):  # conftest.py:516-543
    for how in ("inner", "left"):
        q = (
            QueryBuilder("private")
            .join_public("public", how=how)
            .groupby(KeySet.from_dict({"A+B": [0, 1, 2]}))
            .count()
        )
        _expect(
            _got(sess, q, ["A+B"]),
            pd.DataFrame({"A+B": [0, 1, 2], "count": [3, 4, 1]}),
            ["A+B"],
        )


def test_get_bounds_reference_doc_example(spark):  # query_builder.py:1846-1848
    # The reference's docstring example: data 0..99 -> bounds ±128
    # (power-of-two magnitude bins), with default output column names.
    df = spark.createDataFrame([(i,) for i in range(100)], "X long")
    s = Session.from_dataframe(INF, "my_private_data", df, AddOneRow())
    out = s.evaluate(QueryBuilder("my_private_data").get_bounds("X"), INF)
    row = out.collect()[0]
    assert row["X_lower_bound"] == -128
    assert row["X_upper_bound"] == 128


def test_get_bounds_grouped(spark):
    df = spark.createDataFrame(
        [(i, "a" if i < 50 else "b") for i in range(100)], "X long, g string"
    )
    s = Session.from_dataframe(INF, "t", df, AddOneRow())
    ks = KeySet.from_dict({"g": ["a", "b"]})
    out = s.evaluate(QueryBuilder("t").groupby(ks).get_bounds("X"), INF)
    got = {r["g"]: (r["X_lower_bound"], r["X_upper_bound"]) for r in out.collect()}
    assert got == {"a": (-64, 64), "b": (-128, 128)}
