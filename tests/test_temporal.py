"""Temporal operators: sessionize / asof_join / time_range_join.

Oracles here are brute-force recomputations (pandas merge_asof, naive
cartesian filter) on small synthetic data; the driver-facing queries in
``operators/entry.py`` carry the DuckDB SQL oracles.
"""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tumult_analytics_spark.operators.temporal import (
    asof_join,
    sessionize,
    time_range_join,
)

T0 = dt.datetime(2024, 1, 1)


def _ts(sec):
    return T0 + dt.timedelta(seconds=sec)


@pytest.fixture(scope="module")
def events_df(spark):
    rows = [
        # user 1: sessions {0,100,1900}? gap 1800 -> 0,100 together, 1900 new
        (1, _ts(0), "a", 1.0),
        (1, _ts(100), "b", 2.0),
        (1, _ts(1901), "c", 3.0),
        (1, _ts(1950), "d", 4.0),
        # user 2: single event
        (2, _ts(50), "e", 5.0),
        # user 3: exactly-at-gap boundary is NOT a new session
        (3, _ts(0), "f", 6.0),
        (3, _ts(1800), "g", 7.0),
    ]
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, tag string, value double"
    )


def test_sessionize_gap_boundaries(events_df):
    out = {
        (r.user_id, r.tag): r.session_id
        for r in sessionize(events_df, "user_id", "ts", 1800.0).collect()
    }
    assert out[(1, "a")] == 1
    assert out[(1, "b")] == 1
    assert out[(1, "c")] == 2
    assert out[(1, "d")] == 2
    assert out[(2, "e")] == 1
    # delta == gap exactly: same session (strict > starts a new one)
    assert out[(3, "f")] == 1
    assert out[(3, "g")] == 1


def test_sessionize_single_shuffle(events_df):
    plan = (
        sessionize(events_df, "user_id", "ts", 1800.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan


def _asof_frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts(10), "p1"),
            (1, _ts(30), "p2"),
            (1, _ts(5), "p0"),  # before any right row
            (2, _ts(100), "p3"),  # user with no right rows
            (3, _ts(20), "p4"),  # exact-tie match
        ],
        "user_id long, ts timestamp, pid string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts(8), 1.5),
            (1, _ts(29), 2.5),
            (1, _ts(31), 9.9),  # after p2, never matched backward
            (3, _ts(20), 3.5),  # tie with p4
        ],
        "user_id long, ts timestamp, rv double",
    )
    return left, right


def test_asof_join_backward_with_ties(spark):
    left, right = _asof_frames(spark)
    got = {
        r.pid: (r.rv_r, r.ts_r__asof)
        for r in asof_join(left, right, "user_id", "ts").collect()
    }
    assert got["p0"] == (None, None)
    assert got["p1"] == (1.5, _ts(8))
    assert got["p2"] == (2.5, _ts(29))
    assert got["p3"] == (None, None)
    assert got["p4"] == (3.5, _ts(20))  # exact tie matches


def test_asof_join_tolerance(spark):
    left, right = _asof_frames(spark)
    got = {
        r.pid: r.rv_r
        for r in asof_join(
            left, right, "user_id", "ts", tolerance_seconds=1.5
        ).collect()
    }
    # p1 at t=10 matched t=8 (delta 2 > 1.5) -> nulled; p2 delta 1 kept
    assert got["p1"] is None
    assert got["p2"] == 2.5
    assert got["p4"] == 3.5


def test_asof_join_matches_pandas_merge_asof(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    lpd = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 200),
            "ts": pd.to_datetime(
                rng.integers(0, 10_000, 200) * 1_000_000, unit="us"
            ),
        }
    ).sort_values("ts").reset_index(drop=True)
    lpd["lid"] = range(len(lpd))
    rpd = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 150),
            "ts": pd.to_datetime(
                rng.integers(0, 10_000, 150) * 1_000_000, unit="us"
            ),
            "payload": rng.normal(size=150),
        }
    ).sort_values("ts").reset_index(drop=True)

    want = pd.merge_asof(
        lpd, rpd, on="ts", by="k", direction="backward"
    ).set_index("lid")["payload"]

    got_df = asof_join(
        spark.createDataFrame(lpd),
        spark.createDataFrame(rpd),
        "k",
        "ts",
        right_cols=["payload"],
    )
    got = {r.lid: r.payload_r for r in got_df.collect()}
    for lid, exp in want.items():
        g = got[lid]
        if pd.isna(exp):
            assert g is None, lid
        else:
            assert g == pytest.approx(exp), lid


def test_time_range_join_matches_naive(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    lpd = pd.DataFrame(
        {
            "k": rng.integers(0, 4, 120),
            "ts": pd.to_datetime(
                rng.integers(0, 5_000, 120) * 1_000_000, unit="us"
            ),
        }
    )
    lpd["lid"] = range(len(lpd))
    rpd = pd.DataFrame(
        {
            "k": rng.integers(0, 4, 120),
            "ts": pd.to_datetime(
                rng.integers(0, 5_000, 120) * 1_000_000, unit="us"
            ),
        }
    )
    rpd["rid"] = range(len(rpd))

    # naive oracle: all pairs, same key, 0 <= r.ts - l.ts <= 60s
    x = lpd.merge(rpd, on="k", suffixes=("_l", "_r"))
    d = (x["ts_r"] - x["ts_l"]).dt.total_seconds()
    want = set(zip(x.loc[(d >= 0) & (d <= 60), "lid"], x.loc[(d >= 0) & (d <= 60), "rid"]))

    got_df = time_range_join(
        spark.createDataFrame(lpd),
        spark.createDataFrame(rpd),
        "k",
        "ts",
        "ts",
        0.0,
        60.0,
    )
    got = {(r.lid, r.rid) for r in got_df.collect()}
    assert got == want


def test_time_range_join_no_nested_loop(spark):
    left = spark.createDataFrame(
        [(1, _ts(0)), (1, _ts(10))], "k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _ts(5)), (1, _ts(70))], "k long, ts timestamp"
    )
    plan = (
        time_range_join(left, right, "k", "ts", "ts", 0.0, 60.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan


class TestTemporalPlanShape:
    """The whole point of these operators is the plan: no nested-loop
    joins, minimal exchanges. Lock that in via explain output."""

    def test_asof_join_no_nested_loop(self, spark):
        left = spark.createDataFrame(
            [(1, 10.0)], "k long, ts double"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        right = spark.createDataFrame(
            [(1, 5.0, "x")], "k long, ts double, payload string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        plan = (
            asof_join(left, right, "k", "ts")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        # union-then-window: exactly one exchange (the window partition).
        assert plan.count("Exchange hashpartitioning") == 1

    def test_sessionize_single_exchange(self, spark):
        df = spark.createDataFrame(
            [(1, 10.0)], "u long, ts double"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        plan = (
            sessionize(df, "u", "ts")
            ._jdf.queryExecution().executedPlan().toString()
        )
        # lag + running sum share one window spec: one exchange, and the
        # two window computations collapse into at most two Window nodes
        # over the same sort (no second sort/exchange).
        assert plan.count("Exchange hashpartitioning") == 1
        assert plan.count("Sort ") <= 1

    def test_time_range_join_is_equi_join(self, spark):
        left = spark.createDataFrame(
            [(1, 10.0)], "k long, ts double"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        right = spark.createDataFrame(
            [(1, 5.0)], "k long, ts2 double"
        ).withColumn("ts2", F.col("ts2").cast("timestamp"))
        plan = (
            time_range_join(left, right, "k", "ts", "ts2", 0.0, 60.0)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        # cell-bucketed equi-join: a hash-based join on (key, cell).
        assert ("SortMergeJoin" in plan) or ("HashedRelation" in plan) or (
            "HashJoin" in plan
        )


class TestFunnelConversion:
    def _ev(self, spark, rows):
        from pyspark.sql import functions as F

        return spark.createDataFrame(
            rows, "user_id long, us long, event_type string"
        ).select(
            "user_id",
            F.timestamp_micros(F.col("us")).alias("ts"),
            "event_type",
        )

    def test_strict_order_and_window(self, spark):
        from tumult_analytics_spark.operators.temporal import (
            funnel_conversion,
        )

        H = 3_600_000_000
        ev = self._ev(
            spark,
            [
                # user 1: full funnel in order
                (1, 0 * H, "a"), (1, 1 * H, "b"), (1, 2 * H, "c"),
                # user 2: b BEFORE a -> doesn't count
                (2, 0 * H, "b"), (2, 1 * H, "a"),
                # user 3: b too late (outside window)
                (3, 0 * H, "a"), (3, 50 * H, "b"),
                # user 4: never does step 1
                (4, 0 * H, "b"), (4, 1 * H, "c"),
            ],
        )
        out = {
            r["user_id"]: r["steps_completed"]
            for r in funnel_conversion(
                ev, "user_id", "ts", "event_type",
                steps=("a", "b", "c"), within_seconds=10 * 3600.0,
            ).collect()
        }
        assert out == {1: 3, 2: 1, 3: 1, 4: 0}

    def test_anchor_is_earliest_step1(self, spark):
        from tumult_analytics_spark.operators.temporal import (
            funnel_conversion,
        )

        H = 3_600_000_000
        # second 'a' would put 'b' in window, but the anchor is the FIRST
        ev = self._ev(
            spark, [(1, 0 * H, "a"), (1, 20 * H, "a"), (1, 21 * H, "b")]
        )
        out = funnel_conversion(
            ev, "user_id", "ts", "event_type",
            steps=("a", "b"), within_seconds=5 * 3600.0,
        ).collect()[0]
        assert out["steps_completed"] == 1

    def test_validation(self, spark):
        import pytest as _pytest

        from tumult_analytics_spark.operators.temporal import (
            funnel_conversion,
        )

        ev = self._ev(spark, [(1, 0, "a")])
        with _pytest.raises(ValueError):
            funnel_conversion(ev, "user_id", "ts", "event_type", ("a",), 1.0)


class TestRetentionCohorts:
    def test_cohort_table(self, spark):
        from pyspark.sql import functions as F

        from tumult_analytics_spark.operators.temporal import (
            retention_cohorts,
        )

        D = 86_400_000_000
        ev = spark.createDataFrame(
            [
                (1, 0 * D), (1, 8 * D),          # cohort 0, weeks 0 and 1
                (2, 7 * D), (2, 21 * D),         # cohort 1, weeks 0 and 2
                (3, 1 * D),                       # cohort 0, week 0 only
            ],
            "user_id long, us long",
        ).select("user_id", F.timestamp_micros(F.col("us")).alias("ts"))
        rows = {
            (r["cohort_period"], r["period_offset"]): r["n_active_users"]
            for r in retention_cohorts(ev, "user_id", "ts").collect()
        }
        assert rows == {(0, 0): 2, (0, 1): 1, (1, 0): 1, (1, 2): 1}


class TestIntervalOverlapJoin:
    def _frames(self, spark):
        import datetime as dt

        T0 = dt.datetime(2024, 1, 1)

        def ts(m):
            return T0 + dt.timedelta(minutes=m)

        left = spark.createDataFrame(
            [
                ("u1", "a", ts(0), ts(60)),
                ("u1", "b", ts(90), ts(100)),
                ("u2", "c", ts(0), ts(600)),
                ("u2", "inv", ts(50), ts(40)),  # inverted: dropped
            ],
            "user string, lid string, s timestamp, e timestamp",
        )
        right = spark.createDataFrame(
            [
                ("u1", "X", ts(30), ts(95)),   # overlaps a AND b
                ("u1", "Y", ts(200), ts(300)), # no overlap
                ("u2", "Z", ts(599), ts(700)), # touches c's end
                ("u3", "W", ts(0), ts(1000)),  # key not on left
            ],
            "user string, rid string, s timestamp, e timestamp",
        )
        return left, right

    def test_overlap_semantics(self, spark):
        from tumult_analytics_spark.operators.temporal import (
            interval_overlap_join,
        )

        left, right = self._frames(spark)
        out = interval_overlap_join(
            left, right, "user", "s", "e", "s", "e", cell_seconds=600
        )
        assert sorted((r["lid"], r["rid"]) for r in out.collect()) == [
            ("a", "X"), ("b", "X"), ("c", "Z"),
        ]

    def test_no_duplicates_across_cell_sizes(self, spark):
        # A long interval explodes into many cells; the canonical-cell
        # filter must keep each overlapping pair exactly once whatever
        # the cell width.
        from tumult_analytics_spark.operators.temporal import (
            interval_overlap_join,
        )

        left, right = self._frames(spark)
        expected = [("a", "X"), ("b", "X"), ("c", "Z")]
        for cell in (30, 60, 600, 7200, 86400):
            out = interval_overlap_join(
                left, right, "user", "s", "e", "s", "e", cell_seconds=cell
            )
            assert (
                sorted((r["lid"], r["rid"]) for r in out.collect())
                == expected
            ), cell

    def test_validation(self, spark):
        import pytest as _pytest

        from tumult_analytics_spark.operators.temporal import (
            interval_overlap_join,
        )

        left, right = self._frames(spark)
        with _pytest.raises(ValueError):
            interval_overlap_join(
                left, right, "user", "s", "e", "s", "e", cell_seconds=0
            )


class TestSessionizeSalted:
    """Skew-safe sessionize (r4 verdict #8): bucket_seconds salts the
    window partition with a coarse time bucket so a celebrity key's
    events spread across tasks, then stitches boundary sessions via a
    per-bucket-summary window. Must be VALUE-IDENTICAL to the unsalted
    path."""

    def _random_events(self, spark, seed=7):
        import random

        rng = random.Random(seed)
        rows = []
        eid = 0
        # hot key 0 holds ~10% of all rows; 30 normal keys share the rest
        for _ in range(300):
            rows.append((0, _ts(rng.uniform(0, 500_000)), eid))
            eid += 1
        for k in range(1, 31):
            for _ in range(90):
                rows.append((k, _ts(rng.uniform(0, 500_000)), eid))
                eid += 1
        return spark.createDataFrame(
            rows, "user_id long, ts timestamp, eid long"
        )

    def test_matches_unsalted_on_skewed_data(self, spark):
        df = self._random_events(spark)
        plain = {
            (r.user_id, r.eid): r.session_id
            for r in sessionize(df, "user_id", "ts", 1800.0).collect()
        }
        salted = {
            (r.user_id, r.eid): r.session_id
            for r in sessionize(
                df, "user_id", "ts", 1800.0, bucket_seconds=7200.0
            ).collect()
        }
        assert plain == salted

    def test_session_spanning_many_buckets(self, spark):
        # one session of events every gap/2 across 6 buckets must keep a
        # single id, and a later isolated event gets id 2
        rows = [(1, _ts(i * 900.0), i) for i in range(48)]
        rows.append((1, _ts(100_000.0), 99))
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, eid long"
        )
        out = {
            r.eid: r.session_id
            for r in sessionize(
                df, "user_id", "ts", 1800.0, bucket_seconds=7200.0
            ).collect()
        }
        assert {out[i] for i in range(48)} == {1}
        assert out[99] == 2

    def test_exact_gap_at_bucket_boundary_merges(self, spark):
        # last event of bucket 0 at t=7199, first of bucket 1 at t=8999:
        # delta == gap exactly -> same session (strict > rule), across
        # the bucket seam
        df = spark.createDataFrame(
            [(1, _ts(7199.0), 0), (1, _ts(8999.0), 1)],
            "user_id long, ts timestamp, eid long",
        )
        out = {
            r.eid: r.session_id
            for r in sessionize(
                df, "user_id", "ts", 1800.0, bucket_seconds=7200.0
            ).collect()
        }
        assert out == {0: 1, 1: 1}

    def test_bucket_must_exceed_gap(self, spark):
        df = spark.createDataFrame(
            [(1, _ts(0.0), 0)], "user_id long, ts timestamp, eid long"
        )
        with pytest.raises(ValueError, match="bucket_seconds"):
            sessionize(df, "user_id", "ts", 1800.0, bucket_seconds=1800.0)

    def test_heavy_window_is_salted(self, spark):
        # plan shape: the per-event window partitions on (key, bucket),
        # never on the bare key
        df = self._random_events(spark)
        out = sessionize(
            df, "user_id", "ts", 1800.0, bucket_seconds=7200.0
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        import re

        ev_windows = [
            l
            for l in plan.split("\n")
            if "Window" in l and "__lsid__" in l
        ]
        assert ev_windows, plan
        assert all("__b__" in l for l in ev_windows), ev_windows


class TestAsofJoinSalted:
    """Skew-safe asof_join (r4 verdict #8): bucket_seconds salts the
    union-window partition by coarse time bucket; rows with no earlier
    right row in their bucket take the carry (latest right payload of
    any earlier bucket) from a per-bucket-summary window."""

    def _skewed(self, spark, seed=11):
        import random

        rng = random.Random(seed)
        lrows, rrows = [], []
        lid = 0
        # hot key 0 ~10% of left rows, right quotes sparse
        for _ in range(400):
            lrows.append((0, _ts(rng.uniform(0, 400_000)), lid))
            lid += 1
        for k in range(1, 41):
            for _ in range(90):
                lrows.append((k, _ts(rng.uniform(0, 400_000)), lid))
                lid += 1
        for k in range(0, 41):
            for q in range(20):
                rrows.append((k, _ts(rng.uniform(0, 400_000)), k * 1000 + q))
        left = spark.createDataFrame(
            lrows, "user_id long, ts timestamp, lid long"
        )
        right = spark.createDataFrame(
            rrows, "user_id long, ts timestamp, quote long"
        )
        return left, right

    def test_matches_unsalted_on_skewed_data(self, spark):
        left, right = self._skewed(spark)
        plain = {
            (r.lid): (r.quote_r, r.ts_r__asof)
            for r in asof_join(
                left, right, "user_id", "ts", right_cols=["quote"]
            ).collect()
        }
        salted = {
            (r.lid): (r.quote_r, r.ts_r__asof)
            for r in asof_join(
                left,
                right,
                "user_id",
                "ts",
                right_cols=["quote"],
                bucket_seconds=50_000.0,
            ).collect()
        }
        assert plain == salted

    def test_carry_through_right_empty_buckets(self, spark):
        # right row only in bucket 0; left rows in buckets 2 and 5 must
        # still see it (carry propagates through right-empty buckets)
        left = spark.createDataFrame(
            [(1, _ts(2_500.0), 1), (1, _ts(5_500.0), 2), (1, _ts(100.0), 3)],
            "user_id long, ts timestamp, lid long",
        )
        right = spark.createDataFrame(
            [(1, _ts(200.0), 7)], "user_id long, ts timestamp, quote long"
        )
        out = {
            r.lid: r.quote_r
            for r in asof_join(
                left,
                right,
                "user_id",
                "ts",
                right_cols=["quote"],
                bucket_seconds=1_000.0,
            ).collect()
        }
        # lid 3 is BEFORE the quote (t=100 < 200): null
        assert out == {1: 7, 2: 7, 3: None}

    def test_tolerance_still_applies(self, spark):
        left = spark.createDataFrame(
            [(1, _ts(5_000.0), 1)], "user_id long, ts timestamp, lid long"
        )
        right = spark.createDataFrame(
            [(1, _ts(100.0), 7)], "user_id long, ts timestamp, quote long"
        )
        out = asof_join(
            left,
            right,
            "user_id",
            "ts",
            right_cols=["quote"],
            tolerance_seconds=60.0,
            bucket_seconds=1_000.0,
        ).collect()[0]
        assert out.quote_r is None  # match exists but is too old

    def test_heavy_window_is_salted(self, spark):
        left, right = self._skewed(spark)
        out = asof_join(
            left, right, "user_id", "ts", right_cols=["quote"],
            bucket_seconds=50_000.0,
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        ev_windows = [
            l for l in plan.split("\n") if "Window" in l and "__ml__" in l
        ]
        assert ev_windows, plan
        assert all("__b__" in l for l in ev_windows), ev_windows
