"""System tests for AddMaxRowsInMaxGroups, ported from the reference's
test/system/session/rows/test_add_max_rows_in_max_groups.py:
partitioning on the grouping column, zCDP grouped counts, and
_noise_info parameters.
"""

import math

import pandas as pd
import pytest

from tumult_analytics_spark import (
    AddMaxRowsInMaxGroups,
    KeySet,
    PureDPBudget,
    QueryBuilder,
    RhoZCDPBudget,
    Session,
)


@pytest.fixture()
def sdf(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {"A": ["0", "1", "1", "1"], "B": [0, 0, 1, 2], "X": [0.0, 1.0, 2.0, 3.0]}
        )
    )


@pytest.mark.parametrize("budget", [PureDPBudget(20), RhoZCDPBudget(20)])
def test_partition_on_grouping_column(spark, sdf, budget):
    grouping_df = spark.createDataFrame(pd.DataFrame({"new": [1, 2]}))
    session = Session.from_dataframe(
        privacy_budget=budget,
        source_id="private",
        dataframe=sdf.crossJoin(grouping_df),
        protected_change=AddMaxRowsInMaxGroups(
            grouping_column="new", max_groups=1, max_rows_per_group=1
        ),
    )
    new_sessions = session.partition_and_create(
        source_id="private",
        privacy_budget=budget,
        column="new",
        splits={"new1": 1, "new2": 2},
    )
    r1 = new_sessions["new1"].evaluate(QueryBuilder("new1").count(), budget)
    r2 = new_sessions["new2"].evaluate(QueryBuilder("new2").count(), budget)
    assert r1.count() == 1 and r2.count() == 1


def test_max_rows_per_group_stability_zcdp(spark):
    grouped_df = spark.createDataFrame(
        pd.DataFrame({"id": [7, 7, 8, 9], "group": [0, 1, 0, 1]})
    )
    ks = KeySet.from_dict({"group": [0, 1]})
    session = Session.from_dataframe(
        RhoZCDPBudget(float("inf")),
        "id",
        grouped_df,
        protected_change=AddMaxRowsInMaxGroups(
            "group", max_groups=2, max_rows_per_group=1
        ),
    )
    out = session.evaluate(
        QueryBuilder("id").groupby(ks).count(), RhoZCDPBudget(1)
    )
    assert out.count() == 2


def test_noise_info_laplace_count(sdf):
    # Reference expected: GEOMETRIC with parameter 1/epsilon = 1/7.
    session = Session.from_dataframe(
        PureDPBudget(11),
        "private",
        sdf,
        protected_change=AddMaxRowsInMaxGroups("B", 1, 1),
    )
    q = (
        QueryBuilder("private")
        .groupby(KeySet.from_dict({"B": [0, 1]}))
        .count(mechanism="laplace")
    )
    info = session._noise_info(q, PureDPBudget(7))
    assert info == [
        {"noise_mechanism": "GEOMETRIC", "noise_parameter": pytest.approx(1 / 7)}
    ]


def test_noise_info_gaussian_average_reports_variance(sdf):
    # Average under zCDP splits rho in half between the deviation-sum
    # and the count; each entry's noise_parameter is the VARIANCE
    # (sigma^2), the reference's convention. The count (integer) is
    # discrete Gaussian with sigma^2 = 1/(2 * rho/2).
    session = Session.from_dataframe(
        RhoZCDPBudget(31),
        "private",
        sdf,
        protected_change=AddMaxRowsInMaxGroups("B", 1, 1),
    )
    q = (
        QueryBuilder("private")
        .groupby(KeySet.from_dict({"B": [0, 1]}))
        .average("X", -111, 234, mechanism="gaussian")
    )
    info = session._noise_info(q, RhoZCDPBudget(11))
    assert len(info) == 2
    sum_info, count_info = info
    # deviation bound = (234 - (-111)) / 2 = 172.5; sigma = dev/sqrt(2*rho/2)
    dev = 172.5
    assert sum_info["noise_parameter"] == pytest.approx(
        (dev / math.sqrt(11.0)) ** 2
    )
    assert count_info["noise_mechanism"] == "DISCRETE_GAUSSIAN"
    assert count_info["noise_parameter"] == pytest.approx(
        (1 / math.sqrt(11.0)) ** 2
    )
