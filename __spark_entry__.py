"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry runs a DP query at infinite budget (noise
collapses to zero, so results are exact and oracle-comparable) through the
real Session/QueryBuilder surface of ``tumult_analytics_spark``. The
matching ``oracle_sql()`` entry reproduces the same semantics in ANSI SQL
for DuckDB (keysets become VALUES CTEs; clamping becomes
least/greatest; noisy-zero fill becomes LEFT JOIN + coalesce).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import tumult_analytics_spark as ta
from tumult_analytics_spark import (
    AddOneRow,
    AddRowsWithID,
    KeySet,
    MaxRowsPerID,
    PureDPBudget,
    QueryBuilder,
    Session,
    TruncationStrategy,
)

INF = PureDPBudget(float("inf"))


#: (SparkSession id, sf_dir, table) -> DataFrame. DataFrames are immutable
#: logical plans, so reusing one across queries is safe and skips the
#: ~0.1s footer-read/analysis py4j round trip each bench query would
#: otherwise pay per table.
_READ_CACHE: dict = {}


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (id(spark), sf_dir, name)
    df = _READ_CACHE.get(key)
    if df is None:
        # events.ts has shipped as TIMESTAMP(NANOS) (needs nanosAsLong,
        # arrives as BIGINT nanos) and as timestamp[us] (arrives as NTZ);
        # utils.event_time normalizes both. UTC pins NTZ->epoch parity
        # with the DuckDB oracle.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        _READ_CACHE[key] = df
    return df


def _sess(spark, sf_dir, private: dict, public: dict | None = None) -> Session:
    b = Session.Builder().with_privacy_budget(INF)
    for sid, pc in private.items():
        b = b.with_private_dataframe(sid, _read(spark, sf_dir, sid), pc)
    for sid in public or []:
        b = b.with_public_dataframe(sid, _read(spark, sf_dir, sid))
    return b.build()


# ---------------------------------------------------------------------------
# DP core queries (SURVEY.md §2 operator inventory)

_RF = ["A", "N", "R"]
_LS = ["F", "O"]
_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
_STATUS = ["F", "O", "P"]


def q_count_filter(spark, sf_dir):
    s = _sess(spark, sf_dir, {"lineitem": AddOneRow()})
    q = QueryBuilder("lineitem").filter("l_discount > 0.02").count(name="count")
    return s.evaluate(q, INF)


def q_groupby_count_keyset(spark, sf_dir):
    s = _sess(spark, sf_dir, {"lineitem": AddOneRow()})
    ks = KeySet.from_dict({"l_returnflag": _RF, "l_linestatus": _LS})
    q = QueryBuilder("lineitem").groupby(ks).count(name="count")
    return s.evaluate(q, INF)


def q_sum_clamped(spark, sf_dir):
    s = _sess(spark, sf_dir, {"lineitem": AddOneRow()})
    ks = KeySet.from_dict({"l_returnflag": _RF})
    q = QueryBuilder("lineitem").groupby(ks).sum("l_quantity", 0, 30, name="sum_qty")
    return s.evaluate(q, INF)


def q_average_clamped(spark, sf_dir):
    s = _sess(spark, sf_dir, {"lineitem": AddOneRow()})
    ks = KeySet.from_dict({"l_linestatus": _LS})
    q = QueryBuilder("lineitem").groupby(ks).average(
        "l_quantity", 0, 50, name="avg_qty"
    )
    return s.evaluate(q, INF)


def q_variance_clamped(spark, sf_dir):
    s = _sess(spark, sf_dir, {"lineitem": AddOneRow()})
    ks = KeySet.from_dict({"l_returnflag": _RF})
    q = QueryBuilder("lineitem").groupby(ks).variance("l_quantity", 1, 50, name="var_qty")
    return s.evaluate(q, INF)


def q_stdev_clamped(spark, sf_dir):
    s = _sess(spark, sf_dir, {"lineitem": AddOneRow()})
    ks = KeySet.from_dict({"l_returnflag": _RF})
    q = QueryBuilder("lineitem").groupby(ks).stdev("l_quantity", 1, 50, name="sd_qty")
    return s.evaluate(q, INF)


def q_count_distinct(spark, sf_dir):
    s = _sess(spark, sf_dir, {"lineitem": AddOneRow()})
    ks = KeySet.from_dict({"l_returnflag": _RF})
    q = QueryBuilder("lineitem").groupby(ks).count_distinct(
        ["l_suppkey"], name="nsupp"
    )
    return s.evaluate(q, INF)


def q_public_join_count(spark, sf_dir):
    s = _sess(spark, sf_dir, {"orders": AddOneRow()}, ["customer"])
    ks = KeySet.from_dict({"c_mktsegment": _SEGMENTS})
    q = (
        QueryBuilder("orders")
        .rename({"o_custkey": "c_custkey"})
        .join_public("customer", join_columns=["c_custkey"])
        .groupby(ks)
        .count(name="count")
    )
    return s.evaluate(q, INF)


def q_private_join_count(spark, sf_dir):
    s = _sess(spark, sf_dir, {"lineitem": AddOneRow(), "orders": AddOneRow()})
    ks = KeySet.from_dict({"o_orderstatus": _STATUS})
    q = (
        QueryBuilder("lineitem")
        .rename({"l_orderkey": "o_orderkey"})
        .join_private(
            "orders",
            truncation_strategy_left=TruncationStrategy.DropExcess(15),
            truncation_strategy_right=TruncationStrategy.DropExcess(1),
            join_columns=["o_orderkey"],
        )
        .groupby(ks)
        .count(name="count")
    )
    return s.evaluate(q, INF)


def q_ids_truncated_count(spark, sf_dir):
    s = _sess(spark, sf_dir, {"events": AddRowsWithID("user_id")})
    q = QueryBuilder("events").enforce(MaxRowsPerID(10)).count(name="count")
    return s.evaluate(q, INF)


def q_histogram(spark, sf_dir):
    s = _sess(spark, sf_dir, {"orders": AddOneRow()})
    spec = ta.BinningSpec(
        [0.0, 50000.0, 150000.0, 500000.0], names=["low", "mid", "high"]
    )
    q = QueryBuilder("orders").histogram("o_totalprice", spec, name="price_bin")
    return s.evaluate(q, INF)


#: Yearly bin edges for the o_orderdate timestamp histogram.
_ORDERDATE_EDGES = [
    __import__("datetime").datetime(y, 1, 1) for y in range(1995, 2003)
]


def q_histogram_timestamp(spark, sf_dir):
    # BinningSpec over TIMESTAMP edges (right-closed, both endpoints):
    # binning timestamp columns compiles to the same Catalyst CASE WHEN
    # chain as numeric bins — no Python boundary.
    s = _sess(spark, sf_dir, {"orders": AddOneRow()})
    spec = ta.BinningSpec(_ORDERDATE_EDGES, include_both_endpoints=True)
    q = QueryBuilder("orders").histogram("o_orderdate", spec, name="year_bin")
    return s.evaluate(q, INF)


def _orderdate_oracle_sql() -> str:
    e = [d.isoformat(sep=" ", timespec="minutes") for d in _ORDERDATE_EDGES]
    # DuckDB TIMESTAMP literals need seconds; bin labels keep the
    # BinningSpec rendering (minutes).
    lit = [d.isoformat(sep=" ", timespec="seconds") for d in _ORDERDATE_EDGES]
    whens = [
        f"WHEN o_orderdate >= TIMESTAMP '{lit[0]}' AND o_orderdate <= "
        f"TIMESTAMP '{lit[1]}' THEN '[{e[0]}, {e[1]}]'"
    ]
    for i in range(1, len(e) - 1):
        whens.append(
            f"WHEN o_orderdate > TIMESTAMP '{lit[i]}' AND o_orderdate <= "
            f"TIMESTAMP '{lit[i + 1]}' THEN '({e[i]}, {e[i + 1]}]'"
        )
    case = "CASE " + " ".join(whens) + " ELSE NULL END"
    bins = ", ".join(
        [f"('[{e[0]}, {e[1]}]')"]
        + [f"('({e[i]}, {e[i + 1]}]')" for i in range(1, len(e) - 1)]
    )
    return f"""
        WITH binned AS (SELECT {case} AS year_bin FROM orders),
        keys(year_bin) AS (VALUES {bins})
        SELECT k.year_bin, CAST(coalesce(c.n, 0) AS BIGINT) AS count
        FROM keys k LEFT JOIN (
          SELECT year_bin, count(*) AS n FROM binned
          WHERE year_bin IS NOT NULL GROUP BY 1
        ) c USING (year_bin)
    """


def q_suppress(spark, sf_dir):
    s = _sess(spark, sf_dir, {"orders": AddOneRow()})
    ks = KeySet.from_dict({"o_orderpriority": [
        "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]})
    q = QueryBuilder("orders").groupby(ks).count(name="count").suppress(3000)
    return s.evaluate(q, INF)


def q_keyset_algebra(spark, sf_dir):
    s = _sess(spark, sf_dir, {"customer": AddOneRow()})
    nations = KeySet.from_dataframe(
        _read(spark, sf_dir, "nation").select("n_nationkey")
    )
    segs = KeySet.from_dict({"c_mktsegment": _SEGMENTS})
    ks = (nations * segs).filter("n_nationkey < 20") - KeySet.from_tuples(
        [(5, "BUILDING")], columns=["n_nationkey", "c_mktsegment"]
    )
    q = (
        QueryBuilder("customer")
        .rename({"c_nationkey": "n_nationkey"})
        .groupby(ks)
        .count(name="count")
    )
    return s.evaluate(q, INF)


def q_map_derived_column(spark, sf_dir):
    s = _sess(spark, sf_dir, {"orders": AddOneRow()})
    q = (
        QueryBuilder("orders")
        .map(
            lambda row: {"kprice": int(row["o_totalprice"] // 1000)},
            new_column_types={"kprice": "INTEGER"},
            augment=True,
        )
        .filter("kprice >= 100")
        .sum("kprice", 0, 500, name="sum_kprice")
    )
    return s.evaluate(q, INF)


def q_get_groups(spark, sf_dir):
    s = _sess(spark, sf_dir, {"events": AddOneRow()})
    b = ta.ApproxDPBudget(float("inf"), 1)
    s2 = (
        Session.Builder()
        .with_privacy_budget(b)
        .with_private_dataframe("events", _read(spark, sf_dir, "events"), AddOneRow())
        .build()
    )
    return s2.evaluate(QueryBuilder("events").get_groups(["event_type"]), b)


def q_quantile_median(spark, sf_dir):
    # At infinite budget the exponential mechanism is deterministic
    # (argmax-utility bin midpoint) — reproduced exactly in SQL with
    # integer utility arithmetic (|2*cum + c - 2*q*n|).
    s = _sess(spark, sf_dir, {"lineitem": AddOneRow()})
    ks = KeySet.from_dict({"l_returnflag": _RF})
    q = QueryBuilder("lineitem").groupby(ks).median("l_quantity", 0, 50, name="med")
    return s.evaluate(q, INF)


def q_get_bounds(spark, sf_dir):
    # Deterministic at infinite budget: smallest ±2^k covering >= 95% of
    # magnitude bins — reproduced exactly in SQL.
    s = _sess(spark, sf_dir, {"lineitem": AddOneRow()})
    q = QueryBuilder("lineitem").get_bounds("l_quantity")
    return s.evaluate(q, INF)


def q_flat_map_explode(spark, sf_dir):
    # UDTF path: one row per whole unit of l_quantity, capped at 3.
    s = _sess(spark, sf_dir, {"lineitem": AddOneRow()})
    ks = KeySet.from_dict({"l_returnflag": _RF})
    q = (
        QueryBuilder("lineitem")
        .flat_map(
            lambda row: [
                {"unit": i} for i in range(min(int(row["l_quantity"]), 3))
            ],
            new_column_types={"unit": "INTEGER"},
            augment=True,
            max_rows=3,
        )
        .groupby(ks)
        .count(name="n_units")
    )
    return s.evaluate(q, INF)


def q_flat_map_vectorized(spark, sf_dir):
    # Same semantics as flat_map_explode, via the opt-in pandas-batch
    # UDTF API (f(batch) -> (counts, new_columns)): no per-row dicts, one
    # numpy pass per Arrow batch. Shares flat_map_explode's oracle SQL.
    import numpy as np
    import pandas as pd

    s = _sess(spark, sf_dir, {"lineitem": AddOneRow()})
    ks = KeySet.from_dict({"l_returnflag": _RF})

    def batch_units(pdf):
        counts = np.clip(
            pdf["l_quantity"].to_numpy().astype(np.int64), 0, 3
        )
        total = int(counts.sum())
        starts = np.repeat(
            np.concatenate([[0], np.cumsum(counts)[:-1]]), counts
        )
        units = np.arange(total) - starts
        return counts, pd.DataFrame({"unit": units.astype(np.int32)})

    q = (
        QueryBuilder("lineitem")
        .flat_map(
            batch_units,
            new_column_types={"unit": "INTEGER"},
            augment=True,
            max_rows=3,
            vectorized=True,
        )
        .groupby(ks)
        .count(name="n_units")
    )
    return s.evaluate(q, INF)


def q_map_vectorized(spark, sf_dir):
    # Same semantics as map_derived_column via the pandas-batch map API.
    import pandas as pd

    s = _sess(spark, sf_dir, {"orders": AddOneRow()})

    def batch_kprice(pdf):
        return pd.DataFrame(
            {"kprice": (pdf["o_totalprice"] // 1000).astype("int64")}
        )

    q = (
        QueryBuilder("orders")
        .map(
            batch_kprice,
            new_column_types={"kprice": "INTEGER"},
            augment=True,
            vectorized=True,
        )
        .filter("kprice >= 100")
        .sum("kprice", 0, 500, name="sum_kprice")
    )
    return s.evaluate(q, INF)


def q_flat_map_by_id(spark, sf_dir):
    # Per-privacy-ID UDTF: collapse each user's events to one summary row,
    # then count heavy users (>= 67 events).
    s = _sess(spark, sf_dir, {"events": AddRowsWithID("user_id")})
    q = (
        QueryBuilder("events")
        .flat_map_by_id(
            lambda rows: [{"n_events": len(rows)}],
            new_column_types={"n_events": "INTEGER"},
        )
        .filter("n_events >= 67")
        .enforce(MaxRowsPerID(1))
        .count(name="n_heavy_users")
    )
    return s.evaluate(q, INF)


def q_private_join_nonunique(spark, sf_dir):
    # DropNonUnique truncation: keep only join keys appearing exactly once
    # on each side (orders keys are unique; single-line orders on the left).
    s = _sess(spark, sf_dir, {"lineitem": AddOneRow(), "orders": AddOneRow()})
    ks = KeySet.from_dict({"o_orderstatus": _STATUS})
    q = (
        QueryBuilder("lineitem")
        .rename({"l_orderkey": "o_orderkey"})
        .join_private(
            "orders",
            truncation_strategy_left=TruncationStrategy.DropNonUnique(),
            truncation_strategy_right=TruncationStrategy.DropNonUnique(),
            join_columns=["o_orderkey"],
        )
        .groupby(ks)
        .count(name="count")
    )
    return s.evaluate(q, INF)


def q_replace_null_binned(spark, sf_dir):
    # bin_column sends out-of-range to null; replace_null_and_nan maps the
    # null bin to 'other' before grouping.
    s = _sess(spark, sf_dir, {"orders": AddOneRow()})
    spec = ta.BinningSpec([0.0, 50000.0, 150000.0], names=["low", "high"])
    ks = KeySet.from_dict({"price_bin": ["low", "high", "other"]})
    q = (
        QueryBuilder("orders")
        .bin_column("o_totalprice", spec, name="price_bin")
        .replace_null_and_nan({"price_bin": "other"})
        .groupby(ks)
        .count(name="count")
    )
    return s.evaluate(q, INF)


def q_select_count_distinct(spark, sf_dir):
    # Select is load-bearing here: count_distinct() with no columns
    # counts distinct rows over ALL remaining columns, so narrowing to
    # (status, priority) makes the measurement "distinct priorities per
    # status" — without the select it would be ~row count (reference
    # Select semantics: _query_expr.py:427-473).
    s = _sess(spark, sf_dir, {"orders": AddOneRow()})
    ks = KeySet.from_dict({"o_orderstatus": _STATUS})
    q = (
        QueryBuilder("orders")
        .select(["o_orderstatus", "o_orderpriority"])
        .groupby(ks)
        .count_distinct(name="nd")
    )
    return s.evaluate(q, INF)


def _inf_ratio_batch(pdf):
    # Deterministic +/-inf injection (vectorized map batch fn): rows
    # with o_orderkey % 7 == 0 -> +inf, == 1 -> -inf, else k % 100.
    import numpy as np

    k = pdf["o_orderkey"].to_numpy()
    v = (k % 100).astype("float64")
    v[k % 7 == 0] = np.inf
    v[k % 7 == 1] = -np.inf
    return {"ratio": v}


def q_replace_infinity_sum(spark, sf_dir):
    # ReplaceInfinity maps -inf/+inf to finite endpoints BEFORE the
    # clamp (reference _query_expr.py:1183-1287): +inf -> 500, -inf ->
    # -500, so the replaced rows contribute the endpoints to the sum
    # rather than being dropped.
    s = _sess(spark, sf_dir, {"orders": AddOneRow()})
    ks = KeySet.from_dict({"o_orderstatus": _STATUS})
    q = (
        QueryBuilder("orders")
        .map(_inf_ratio_batch, {"ratio": "DECIMAL"}, augment=True,
             vectorized=True)
        .replace_infinity({"ratio": (-500.0, 500.0)})
        .groupby(ks)
        .sum("ratio", -500.0, 500.0, name="sum_ratio")
    )
    return s.evaluate(q, INF)


def _nan_null_batch(pdf):
    # NaN in a DOUBLE column (k % 7 == 0) and true NULL in a nullable
    # INTEGER column (k % 7 == 1) — exercising both drop paths of
    # DropNullAndNan, which Spark treats differently (isnan vs isNull).
    import numpy as np
    import pandas as pd

    k = pdf["o_orderkey"].to_numpy()
    a = (k % 100).astype("float64")
    a[k % 7 == 0] = np.nan
    b = pd.array(k % 10, dtype="Int64")
    b[k % 7 == 1] = pd.NA
    return {"a": a, "b": b}


def q_drop_null_and_nan_sum(spark, sf_dir):
    # DropNullAndNan(columns) drops rows where ANY listed column is
    # null or NaN (reference _query_expr.py:1290-1371): here the k%7==0
    # rows fall to the NaN in `a` and k%7==1 rows to the NULL in `b`.
    s = _sess(spark, sf_dir, {"orders": AddOneRow()})
    ks = KeySet.from_dict({"o_orderstatus": _STATUS})
    q = (
        QueryBuilder("orders")
        .map(_nan_null_batch, {"a": "DECIMAL", "b": "INTEGER"},
             augment=True, vectorized=True)
        .drop_null_and_nan(["a", "b"])
        .groupby(ks)
        .sum("a", 0.0, 100.0, name="sum_a")
    )
    return s.evaluate(q, INF)


def _inf_v_batch(pdf):
    import numpy as np

    k = pdf["o_orderkey"].to_numpy()
    v = (k % 50).astype("float64")
    v[k % 5 == 0] = np.inf
    v[k % 5 == 1] = -np.inf
    return {"v": v}


def q_drop_infinity_average(spark, sf_dir):
    # DropInfinity removes the +/-inf rows entirely (reference
    # _query_expr.py:1374-1452) — contrast with replace_infinity_sum
    # where they contribute endpoint values; the DP average then sees
    # only the finite k % 50 values.
    s = _sess(spark, sf_dir, {"orders": AddOneRow()})
    ks = KeySet.from_dict({"o_orderstatus": _STATUS})
    q = (
        QueryBuilder("orders")
        .map(_inf_v_batch, {"v": "DECIMAL"}, augment=True,
             vectorized=True)
        .drop_infinity(["v"])
        .groupby(ks)
        .average("v", 0.0, 49.0, name="avg_v")
    )
    return s.evaluate(q, INF)


def q_min_max(spark, sf_dir):
    # min and max from ONE multi-quantile measurement (quantiles 0 and 1
    # share a single clamp->bin->count histogram pass — the engine's
    # extension over the reference's one-quantile-per-query API), then
    # unpivoted to (stat, value) via explode — no union of two jobs, no
    # crossJoin.
    from pyspark.sql import functions as F

    s = _sess(spark, sf_dir, {"lineitem": AddOneRow()})
    q = QueryBuilder("lineitem").quantiles(
        "l_quantity", [0.0, 1.0], 0, 60, names=["vmin", "vmax"]
    )
    r = s.evaluate(q, INF)
    return r.select(
        F.explode(
            F.array(
                F.struct(F.lit("min").alias("stat"), F.col("vmin").alias("value")),
                F.struct(F.lit("max").alias("stat"), F.col("vmax").alias("value")),
            )
        ).alias("__p__")
    ).select("__p__.*")


def q_multi_quantile(spark, sf_dir):
    # Grouped quartiles (q25/q50/q75) of l_quantity in ONE histogram
    # pass with the budget split across the three exponential
    # mechanisms; deterministic at infinite budget — the oracle replays
    # the binned argmax per quantile with integer utility arithmetic
    # |4*cum + 2*c - 4*q*n|.
    s = _sess(spark, sf_dir, {"lineitem": AddOneRow()})
    ks = KeySet.from_dict({"l_returnflag": _RF})
    q = (
        QueryBuilder("lineitem")
        .groupby(ks)
        .quantiles("l_quantity", [0.25, 0.5, 0.75], 0, 50, names=["q25", "q50", "q75"])
    )
    return s.evaluate(q, INF)


def q_groups_per_id_count(spark, sf_dir):
    # L0/Linf truncation pair: <=10 event types per user (no-op here, the
    # domain has 5) and <=5 rows per (user, type) — SQL-reproducible
    # because the L0 cut never bites while the Linf cut is a per-group
    # least(count, 5).
    s = _sess(spark, sf_dir, {"events": AddRowsWithID("user_id")})
    from tumult_analytics_spark import MaxGroupsPerID, MaxRowsPerGroupPerID

    ks = KeySet.from_dict(
        {"event_type": ["click", "error", "purchase", "signup", "view"]}
    )
    q = (
        QueryBuilder("events")
        .enforce(MaxGroupsPerID("event_type", 10))
        .enforce(MaxRowsPerGroupPerID("event_type", 5))
        .groupby(ks)
        .count(name="count")
    )
    return s.evaluate(q, INF)


def q_view_count(spark, sf_dir):
    # create_view (cached) then query the view.
    s = _sess(spark, sf_dir, {"lineitem": AddOneRow()})
    s.create_view(
        QueryBuilder("lineitem").filter("l_discount > 0.05"),
        "discounted",
        cache=True,
    )
    out = s.evaluate(QueryBuilder("discounted").count(name="count"), INF)
    s.delete_view("discounted")
    return out


def q_partition_split_count(spark, sf_dir):
    # partition_and_create: child session over the 'F' slice.
    s = _sess(spark, sf_dir, {"orders": AddOneRow()})
    children = s.partition_and_create(
        "orders", INF, "o_orderstatus", {"f": "F"}
    )
    # Children expose the partition under the SPLIT NAME (reference
    # session.py:1523-1530: private_sources == ['part0']).
    return children["f"].evaluate(QueryBuilder("f").count(name="count"), INF)


def q_auto_partition_count(spark, sf_dir):
    # DP partition selection (ApproxDP): with infinite budget every
    # non-empty group survives with its exact count.
    b = ta.ApproxDPBudget(float("inf"), 1)
    s = (
        Session.Builder()
        .with_privacy_budget(b)
        .with_private_dataframe("events", _read(spark, sf_dir, "events"), AddOneRow())
        .build()
    )
    from tumult_analytics_spark.config import config

    with config.features.auto_partition_selection.enabled():
        q = QueryBuilder("events").groupby(["event_type"]).count(name="count")
    return s.evaluate(q, b)


# ---------------------------------------------------------------------------
# Oracle SQL (DuckDB dialect-neutral ANSI; tables pre-registered as views)

_KS_RF_LS = (
    "SELECT rf.l_returnflag, ls.l_linestatus FROM (VALUES ('A'),('N'),('R')) "
    "rf(l_returnflag) CROSS JOIN (VALUES ('F'),('O')) ls(l_linestatus)"
)

_ORACLES = {
    "count_filter": (
        "SELECT count(*) AS count FROM lineitem WHERE l_discount > 0.02"
    ),
    "groupby_count_keyset": f"""
        WITH ks AS ({_KS_RF_LS}),
        agg AS (SELECT l_returnflag, l_linestatus, count(*) AS c
                FROM lineitem GROUP BY 1, 2)
        SELECT ks.l_returnflag, ks.l_linestatus,
               CAST(coalesce(agg.c, 0) AS BIGINT) AS count
        FROM ks LEFT JOIN agg USING (l_returnflag, l_linestatus)
    """,
    "sum_clamped": """
        WITH ks AS (SELECT * FROM (VALUES ('A'),('N'),('R')) t(l_returnflag)),
        agg AS (SELECT l_returnflag,
                       sum(least(greatest(l_quantity, 0), 30)) AS s
                FROM lineitem GROUP BY 1)
        SELECT ks.l_returnflag, coalesce(agg.s, 0.0) AS sum_qty
        FROM ks LEFT JOIN agg USING (l_returnflag)
    """,
    "average_clamped": """
        WITH ks AS (SELECT * FROM (VALUES ('F'),('O')) t(l_linestatus)),
        agg AS (SELECT l_linestatus,
                       sum(least(greatest(l_quantity, 0), 50) - 25.0) AS sdev,
                       count(*) AS n
                FROM lineitem GROUP BY 1)
        SELECT ks.l_linestatus,
               25.0 + coalesce(agg.sdev, 0.0)
                     / greatest(CAST(coalesce(agg.n, 0) AS DOUBLE), 1.0)
                   AS avg_qty
        FROM ks LEFT JOIN agg USING (l_linestatus)
    """,
    "variance_clamped": """
        WITH ks AS (SELECT * FROM (VALUES ('A'),('N'),('R')) t(l_returnflag)),
        base AS (SELECT l_returnflag,
                        least(greatest(l_quantity, 1), 50) - 25.5 AS d
                 FROM lineitem),
        agg AS (SELECT l_returnflag, sum(d) AS sd, sum(d*d) AS sdd,
                       count(*) AS n
                FROM base GROUP BY 1)
        SELECT ks.l_returnflag,
               greatest((coalesce(agg.sdd, 0.0)
                 - coalesce(agg.sd, 0.0) * coalesce(agg.sd, 0.0)
                   / greatest(CAST(coalesce(agg.n, 0) AS DOUBLE), 1.0))
                 / greatest(CAST(coalesce(agg.n, 0) AS DOUBLE) - 1.0, 1.0),
                 0.0) AS var_qty
        FROM ks LEFT JOIN agg USING (l_returnflag)
    """,
    "stdev_clamped": """
        WITH ks AS (SELECT * FROM (VALUES ('A'),('N'),('R')) t(l_returnflag)),
        base AS (SELECT l_returnflag,
                        least(greatest(l_quantity, 1), 50) - 25.5 AS d
                 FROM lineitem),
        agg AS (SELECT l_returnflag, sum(d) AS sd, sum(d*d) AS sdd,
                       count(*) AS n
                FROM base GROUP BY 1)
        SELECT ks.l_returnflag,
               sqrt(greatest((coalesce(agg.sdd, 0.0)
                 - coalesce(agg.sd, 0.0) * coalesce(agg.sd, 0.0)
                   / greatest(CAST(coalesce(agg.n, 0) AS DOUBLE), 1.0))
                 / greatest(CAST(coalesce(agg.n, 0) AS DOUBLE) - 1.0, 1.0),
                 0.0)) AS sd_qty
        FROM ks LEFT JOIN agg USING (l_returnflag)
    """,
    "count_distinct": """
        WITH ks AS (SELECT * FROM (VALUES ('A'),('N'),('R')) t(l_returnflag)),
        agg AS (SELECT l_returnflag, count(DISTINCT l_suppkey) AS c
                FROM lineitem GROUP BY 1)
        SELECT ks.l_returnflag, CAST(coalesce(agg.c, 0) AS BIGINT) AS nsupp
        FROM ks LEFT JOIN agg USING (l_returnflag)
    """,
    "public_join_count": """
        WITH ks AS (SELECT * FROM (VALUES ('AUTOMOBILE'),('BUILDING'),
            ('FURNITURE'),('HOUSEHOLD'),('MACHINERY')) t(c_mktsegment)),
        agg AS (SELECT c.c_mktsegment, count(*) AS c
                FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                GROUP BY 1)
        SELECT ks.c_mktsegment, CAST(coalesce(agg.c, 0) AS BIGINT) AS count
        FROM ks LEFT JOIN agg USING (c_mktsegment)
    """,
    "private_join_count": """
        -- DropExcess(15) on the lineitem side DOES bite at sf >= 0.1
        -- (a few orders carry 16-17 lines): cap per join key. The
        -- orders side's DropExcess(1) is a no-op (o_orderkey unique).
        WITH ks AS (SELECT * FROM (VALUES ('F'),('O'),('P')) t(o_orderstatus)),
        lt AS (SELECT l_orderkey, least(count(*), 15) AS n
               FROM lineitem GROUP BY 1),
        agg AS (SELECT o.o_orderstatus, sum(lt.n) AS c
                FROM lt JOIN orders o ON lt.l_orderkey = o.o_orderkey
                GROUP BY 1)
        SELECT ks.o_orderstatus, CAST(coalesce(agg.c, 0) AS BIGINT) AS count
        FROM ks LEFT JOIN agg USING (o_orderstatus)
    """,
    "ids_truncated_count": """
        SELECT CAST(sum(least(c, 10)) AS BIGINT) AS count
        FROM (SELECT count(*) AS c FROM events GROUP BY user_id)
    """,
    "histogram": """
        WITH ks AS (SELECT * FROM (VALUES ('low'),('mid'),('high')) t(price_bin)),
        binned AS (SELECT CASE
              WHEN o_totalprice >= 0 AND o_totalprice <= 50000 THEN 'low'
              WHEN o_totalprice > 50000 AND o_totalprice <= 150000 THEN 'mid'
              WHEN o_totalprice > 150000 AND o_totalprice <= 500000 THEN 'high'
              END AS price_bin FROM orders),
        agg AS (SELECT price_bin, count(*) AS c FROM binned
                WHERE price_bin IS NOT NULL GROUP BY 1)
        SELECT ks.price_bin, CAST(coalesce(agg.c, 0) AS BIGINT) AS count
        FROM ks LEFT JOIN agg USING (price_bin)
    """,
    "suppress": """
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS count
        FROM orders GROUP BY 1 HAVING count(*) >= 3000
    """,
    "keyset_algebra": """
        WITH ks AS (
            SELECT n.n_nationkey, s.c_mktsegment
            FROM (SELECT DISTINCT n_nationkey FROM nation) n
            CROSS JOIN (VALUES ('AUTOMOBILE'),('BUILDING'),('FURNITURE'),
                ('HOUSEHOLD'),('MACHINERY')) s(c_mktsegment)
            WHERE n.n_nationkey < 20
            EXCEPT SELECT 5, 'BUILDING'
        ),
        agg AS (SELECT c_nationkey AS n_nationkey, c_mktsegment,
                       count(*) AS c
                FROM customer GROUP BY 1, 2)
        SELECT ks.n_nationkey, ks.c_mktsegment,
               CAST(coalesce(agg.c, 0) AS BIGINT) AS count
        FROM ks LEFT JOIN agg USING (n_nationkey, c_mktsegment)
    """,
    "map_derived_column": """
        WITH m AS (SELECT CAST(floor(o_totalprice / 1000) AS BIGINT) AS kprice
                   FROM orders)
        SELECT CAST(coalesce(sum(least(greatest(kprice, 0), 500)), 0) AS BIGINT)
               AS sum_kprice
        FROM m WHERE kprice >= 100
    """,
    "get_groups": """
        SELECT DISTINCT event_type FROM events
    """,
    "get_bounds": """
        WITH data AS (
          SELECT CASE WHEN abs(l_quantity) <= 1 THEN 0
                 ELSE CAST(ceil(log2(abs(l_quantity))) AS INT) END AS b
          FROM lineitem
        ),
        counts AS (SELECT b, count(*) AS c FROM data GROUP BY 1),
        scored AS (
          SELECT b, sum(c) OVER (ORDER BY b) AS acc, sum(c) OVER () AS n
          FROM counts
        ),
        picked AS (
          SELECT b, row_number() OVER (ORDER BY b) AS rk
          FROM scored
          WHERE CAST(acc AS DOUBLE) / CAST(n AS DOUBLE) >= 0.95
        )
        SELECT -pow(2.0, b) AS l_quantity_lower_bound,
               pow(2.0, b) AS l_quantity_upper_bound
        FROM picked WHERE rk = 1
    """,
    "quantile_median": """
        WITH ks AS (SELECT * FROM (VALUES ('A'),('N'),('R')) t(l_returnflag)),
        bins AS (SELECT CAST(range AS INT) AS b FROM range(0, 512)),
        data AS (
          SELECT l_returnflag,
                 least(CAST(floor(least(greatest(l_quantity, 0), 50)
                       / (50.0/512)) AS INT), 511) AS b
          FROM lineitem
        ),
        counts AS (SELECT l_returnflag, b, count(*) AS c FROM data GROUP BY 1, 2),
        grid AS (
          SELECT ks.l_returnflag, bins.b, coalesce(counts.c, 0) AS c
          FROM ks CROSS JOIN bins
          LEFT JOIN counts ON counts.l_returnflag = ks.l_returnflag
                          AND counts.b = bins.b
        ),
        scored AS (
          SELECT l_returnflag, b, c,
            coalesce(sum(c) OVER (PARTITION BY l_returnflag ORDER BY b
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS cum,
            sum(c) OVER (PARTITION BY l_returnflag) AS n
          FROM grid
        ),
        ranked AS (
          SELECT l_returnflag, b,
            row_number() OVER (PARTITION BY l_returnflag
                ORDER BY abs(2*cum + c - n) ASC, b ASC) AS rk
          FROM scored
        )
        SELECT l_returnflag, (b + 0.5) * (50.0/512) AS med
        FROM ranked WHERE rk = 1
    """,
    "min_max": """
        WITH bins AS (SELECT CAST(range AS INT) AS b FROM range(0, 512)),
        data AS (
          SELECT least(CAST(floor(least(greatest(l_quantity, 0), 60)
                 / (60.0/512)) AS INT), 511) AS b
          FROM lineitem
        ),
        counts AS (SELECT b, count(*) AS c FROM data GROUP BY 1),
        grid AS (
          SELECT bins.b, coalesce(counts.c, 0) AS c
          FROM bins LEFT JOIN counts USING (b)
        ),
        scored AS (
          SELECT b, c,
            coalesce(sum(c) OVER (ORDER BY b
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS cum,
            sum(c) OVER () AS n
          FROM grid
        ),
        qmin AS (
          SELECT 'min' AS stat, (b + 0.5) * (60.0/512) AS value,
            row_number() OVER (ORDER BY abs(2*cum + c) ASC, b ASC) AS rk
          FROM scored
        ),
        qmax AS (
          SELECT 'max' AS stat, (b + 0.5) * (60.0/512) AS value,
            row_number() OVER (ORDER BY abs(2*cum + c - 2*n) ASC, b ASC) AS rk
          FROM scored
        )
        SELECT stat, value FROM qmin WHERE rk = 1
        UNION ALL
        SELECT stat, value FROM qmax WHERE rk = 1
    """,
    "multi_quantile": """
        WITH ks AS (SELECT * FROM (VALUES ('A'),('N'),('R')) t(l_returnflag)),
        bins AS (SELECT CAST(range AS INT) AS b FROM range(0, 512)),
        data AS (
          SELECT l_returnflag,
                 least(CAST(floor(least(greatest(l_quantity, 0), 50)
                       / (50.0/512)) AS INT), 511) AS b
          FROM lineitem
        ),
        counts AS (SELECT l_returnflag, b, count(*) AS c FROM data GROUP BY 1, 2),
        grid AS (
          SELECT ks.l_returnflag, bins.b, coalesce(counts.c, 0) AS c
          FROM ks CROSS JOIN bins
          LEFT JOIN counts ON counts.l_returnflag = ks.l_returnflag
                          AND counts.b = bins.b
        ),
        scored AS (
          SELECT l_returnflag, b, c,
            coalesce(sum(c) OVER (PARTITION BY l_returnflag ORDER BY b
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS cum,
            sum(c) OVER (PARTITION BY l_returnflag) AS n
          FROM grid
        ),
        r25 AS (
          SELECT l_returnflag, (b + 0.5) * (50.0/512) AS q25,
            row_number() OVER (PARTITION BY l_returnflag
                ORDER BY abs(4*cum + 2*c - n) ASC, b ASC) AS rk
          FROM scored
        ),
        r50 AS (
          SELECT l_returnflag, (b + 0.5) * (50.0/512) AS q50,
            row_number() OVER (PARTITION BY l_returnflag
                ORDER BY abs(4*cum + 2*c - 2*n) ASC, b ASC) AS rk
          FROM scored
        ),
        r75 AS (
          SELECT l_returnflag, (b + 0.5) * (50.0/512) AS q75,
            row_number() OVER (PARTITION BY l_returnflag
                ORDER BY abs(4*cum + 2*c - 3*n) ASC, b ASC) AS rk
          FROM scored
        )
        SELECT r25.l_returnflag, r25.q25, r50.q50, r75.q75
        FROM r25
        JOIN r50 ON r50.l_returnflag = r25.l_returnflag AND r50.rk = 1
        JOIN r75 ON r75.l_returnflag = r25.l_returnflag AND r75.rk = 1
        WHERE r25.rk = 1
    """,

    "flat_map_explode": """
        WITH ks AS (SELECT * FROM (VALUES ('A'),('N'),('R')) t(l_returnflag)),
        agg AS (SELECT l_returnflag,
                       sum(least(CAST(floor(l_quantity) AS BIGINT), 3)) AS c
                FROM lineitem GROUP BY 1)
        SELECT ks.l_returnflag, CAST(coalesce(agg.c, 0) AS BIGINT) AS n_units
        FROM ks LEFT JOIN agg USING (l_returnflag)
    """,
    "flat_map_by_id": """
        SELECT CAST(count(*) AS BIGINT) AS n_heavy_users
        FROM (SELECT user_id FROM events GROUP BY user_id
              HAVING count(*) >= 67)
    """,
    "private_join_nonunique": """
        WITH ks AS (SELECT * FROM (VALUES ('F'),('O'),('P')) t(o_orderstatus)),
        lu AS (SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
               HAVING count(*) = 1),
        ou AS (SELECT o_orderkey, o_orderstatus FROM orders
               WHERE o_orderkey IN (SELECT o_orderkey FROM orders
                                    GROUP BY o_orderkey HAVING count(*) = 1)),
        agg AS (SELECT ou.o_orderstatus, count(*) AS c
                FROM lu JOIN ou ON lu.l_orderkey = ou.o_orderkey
                GROUP BY 1)
        SELECT ks.o_orderstatus, CAST(coalesce(agg.c, 0) AS BIGINT) AS count
        FROM ks LEFT JOIN agg USING (o_orderstatus)
    """,
    "replace_null_binned": """
        WITH ks AS (SELECT * FROM (VALUES ('low'),('high'),('other'))
                    t(price_bin)),
        binned AS (SELECT CASE
              WHEN o_totalprice >= 0 AND o_totalprice <= 50000 THEN 'low'
              WHEN o_totalprice > 50000 AND o_totalprice <= 150000 THEN 'high'
              ELSE 'other' END AS price_bin FROM orders),
        agg AS (SELECT price_bin, count(*) AS c FROM binned GROUP BY 1)
        SELECT ks.price_bin, CAST(coalesce(agg.c, 0) AS BIGINT) AS count
        FROM ks LEFT JOIN agg USING (price_bin)
    """,
    "select_count_distinct": """
        WITH ks AS (SELECT * FROM (VALUES ('F'),('O'),('P'))
                    t(o_orderstatus)),
        agg AS (SELECT o_orderstatus,
                       count(DISTINCT o_orderpriority) AS c
                FROM orders GROUP BY 1)
        SELECT ks.o_orderstatus, CAST(coalesce(agg.c, 0) AS BIGINT) AS nd
        FROM ks LEFT JOIN agg USING (o_orderstatus)
    """,
    "replace_infinity_sum": """
        WITH ks AS (SELECT * FROM (VALUES ('F'),('O'),('P'))
                    t(o_orderstatus)),
        v AS (SELECT o_orderstatus,
                     CASE o_orderkey % 7
                       WHEN 0 THEN 500.0 WHEN 1 THEN -500.0
                       ELSE CAST(o_orderkey % 100 AS DOUBLE) END AS ratio
              FROM orders),
        agg AS (SELECT o_orderstatus,
                       sum(least(greatest(ratio, -500), 500)) AS s
                FROM v GROUP BY 1)
        SELECT ks.o_orderstatus,
               CAST(coalesce(agg.s, 0.0) AS DOUBLE) AS sum_ratio
        FROM ks LEFT JOIN agg USING (o_orderstatus)
    """,
    "drop_null_and_nan_sum": """
        WITH ks AS (SELECT * FROM (VALUES ('F'),('O'),('P'))
                    t(o_orderstatus)),
        v AS (SELECT o_orderstatus, CAST(o_orderkey % 100 AS DOUBLE) AS a
              FROM orders WHERE o_orderkey % 7 NOT IN (0, 1)),
        agg AS (SELECT o_orderstatus,
                       sum(least(greatest(a, 0), 100)) AS s
                FROM v GROUP BY 1)
        SELECT ks.o_orderstatus,
               CAST(coalesce(agg.s, 0.0) AS DOUBLE) AS sum_a
        FROM ks LEFT JOIN agg USING (o_orderstatus)
    """,
    "drop_infinity_average": """
        WITH ks AS (SELECT * FROM (VALUES ('F'),('O'),('P'))
                    t(o_orderstatus)),
        v AS (SELECT o_orderstatus, CAST(o_orderkey % 50 AS DOUBLE) AS v
              FROM orders WHERE o_orderkey % 5 NOT IN (0, 1)),
        agg AS (SELECT o_orderstatus,
                       sum(least(greatest(v, 0), 49) - 24.5) AS sdev,
                       count(*) AS n
                FROM v GROUP BY 1)
        SELECT ks.o_orderstatus,
               24.5 + coalesce(agg.sdev, 0.0)
                     / greatest(CAST(coalesce(agg.n, 0) AS DOUBLE), 1.0)
                   AS avg_v
        FROM ks LEFT JOIN agg USING (o_orderstatus)
    """,
    "groups_per_id_count": """
        WITH ks AS (SELECT * FROM (VALUES ('click'),('error'),('purchase'),
                    ('signup'),('view')) t(event_type)),
        per AS (SELECT user_id, event_type, count(*) AS c
                FROM events GROUP BY 1, 2),
        agg AS (SELECT event_type, sum(least(c, 5)) AS c
                FROM per GROUP BY 1)
        SELECT ks.event_type, CAST(coalesce(agg.c, 0) AS BIGINT) AS count
        FROM ks LEFT JOIN agg USING (event_type)
    """,
    "view_count": """
        SELECT count(*) AS count FROM lineitem WHERE l_discount > 0.05
    """,
    "partition_split_count": """
        SELECT count(*) AS count FROM orders WHERE o_orderstatus = 'F'
    """,
    "auto_partition_count": """
        SELECT event_type, CAST(count(*) AS BIGINT) AS count
        FROM events GROUP BY 1
    """,
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: filtered group-by sum over a keyset."""
    sf_dir = "/root/testdata/sf0.001"
    s = _sess(spark, sf_dir, {"lineitem": AddOneRow()})
    ks = KeySet.from_dict({"l_returnflag": _RF, "l_linestatus": _LS})
    q = (
        QueryBuilder("lineitem")
        .filter("l_shipdate <= '1998-09-02'")
        .groupby(ks)
        .sum("l_quantity", 0, 50, name="sum_qty")
    )
    return s.evaluate(q, INF)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    base = {
        "count_filter": q_count_filter,
        "groupby_count_keyset": q_groupby_count_keyset,
        "sum_clamped": q_sum_clamped,
        "average_clamped": q_average_clamped,
        "variance_clamped": q_variance_clamped,
        "stdev_clamped": q_stdev_clamped,
        "count_distinct": q_count_distinct,
        "public_join_count": q_public_join_count,
        "private_join_count": q_private_join_count,
        "ids_truncated_count": q_ids_truncated_count,
        "histogram": q_histogram,
        "histogram_timestamp": q_histogram_timestamp,
        "suppress": q_suppress,
        "keyset_algebra": q_keyset_algebra,
        "map_derived_column": q_map_derived_column,
        "get_groups": q_get_groups,
        "quantile_median": q_quantile_median,
        "get_bounds": q_get_bounds,
        "flat_map_explode": q_flat_map_explode,
        "flat_map_vectorized": q_flat_map_vectorized,
        "map_vectorized": q_map_vectorized,
        "flat_map_by_id": q_flat_map_by_id,
        "private_join_nonunique": q_private_join_nonunique,
        "replace_null_binned": q_replace_null_binned,
        "select_count_distinct": q_select_count_distinct,
        "replace_infinity_sum": q_replace_infinity_sum,
        "drop_null_and_nan_sum": q_drop_null_and_nan_sum,
        "drop_infinity_average": q_drop_infinity_average,
        "min_max": q_min_max,
        "multi_quantile": q_multi_quantile,
        "groups_per_id_count": q_groups_per_id_count,
        "view_count": q_view_count,
        "partition_split_count": q_partition_split_count,
        "auto_partition_count": q_auto_partition_count,
    }
    try:
        from tumult_analytics_spark.operators import entry_queries

        base.update(entry_queries())
    except ImportError:
        pass
    return base


_ORACLES["flat_map_vectorized"] = _ORACLES["flat_map_explode"]
_ORACLES["histogram_timestamp"] = _orderdate_oracle_sql()
_ORACLES["map_vectorized"] = _ORACLES["map_derived_column"]


def oracle_sql() -> dict[str, str]:
    out = dict(_ORACLES)
    try:
        from tumult_analytics_spark.operators import entry_oracles

        out.update(entry_oracles())
    except ImportError:
        pass
    return out
