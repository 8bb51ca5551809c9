"""Temporal operators Spark's DataFrame API lacks as primitives: gap-based
sessionization, as-of (most-recent-prior) joins, and bounded time-range
joins. All three are standard event-pipeline building blocks (cf. KDB
``aj``, DuckDB/Pandas ``ASOF JOIN``, Flink interval joins) re-expressed as
compositions of Spark window functions and equi-joins so Catalyst keeps
every step in whole-stage codegen.

Scale design notes (100 TB):

- ``sessionize`` is ONE shuffle: both window expressions (lag + running
  sum) share the same ``partitionBy(user).orderBy(ts)`` spec, so Spark
  plans a single Exchange + single sort and evaluates both in one Window
  operator. No Python, no state store.
- ``asof_join`` uses the union-then-window formulation instead of a
  range join: tag each side, union, and take ``last(right_payload,
  ignorenulls=True)`` over rows up to the current one. Cost is one
  shuffle of |L|+|R| rows on the join key — versus the
  BroadcastNestedLoopJoin (O(|L|x|R|) comparisons) Spark would pick for
  the naive ``l.ts >= r.ts`` theta-join. Equal timestamps order the
  right row first, so a same-instant right row IS visible to the left
  row (DuckDB ASOF semantics).
- ``time_range_join`` buckets time into ``ceil(window/bucket)+1``-wide
  coarse cells and equi-joins on (key, cell) before the exact range
  filter: a theta-join becomes a hash join whose fan-out per left row is
  at most 2 buckets when ``bucket >= upper-lower``. This is the
  standard interval-join decomposition (Flink runs the same plan in its
  interval-join operator).
- Skew: both joins shuffle by the user-supplied key; a celebrity key
  concentrates its events in one task. AQE skew-join splitting handles
  moderate skew; for pathological keys, pre-salt the key and run
  per-salt sessions/joins, or bucket time into the key as
  ``time_range_join`` already does.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "sessionize",
    "asof_join",
    "time_range_join",
    "interval_overlap_join",
    "funnel_conversion",
    "retention_cohorts",
]


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_seconds: float = 1800.0,
    session_col: str = "session_id",
    bucket_seconds: Optional[float] = None,
) -> DataFrame:
    """Assign gap-based session indices per key.

    A new session starts at the first event of a key and whenever the
    time since the previous event exceeds ``gap_seconds``. The output
    adds ``session_col`` (1-based index of the session within the key);
    (key, session_col) identifies a session globally.

    Default path: single shuffle — lag and the running sum share one
    window spec partitioned by the key. A celebrity key concentrates
    ALL its events in one task; AQE cannot split a window partition.

    ``bucket_seconds`` (opt-in, must exceed ``gap_seconds``) is the
    skew mitigation: events are salted by coarse time bucket
    ``floor(ts / bucket_seconds)``, sessions are computed WITHIN each
    (key, bucket) window partition — so a hot key's events spread over
    time also spread over tasks — and bucket-boundary sessions are
    stitched by a second, tiny window over per-bucket SUMMARIES (one
    row per (key, bucket): first/last timestamp, local session count).
    A session that spans buckets merges iff the first event of a bucket
    is within ``gap`` of the last event of the key's previous non-empty
    bucket; because ``bucket > gap``, only chains of adjacent buckets
    can merge, and the cumulative ``(local_sessions - merged)`` offset
    renumbers every event to EXACTLY the ids the unsalted path
    produces (value-equality locked by
    tests/test_temporal.py::TestSessionizeSalted).
    """
    gap_us = int(gap_seconds * 1_000_000)
    if bucket_seconds is None:
        w = Window.partitionBy(key).orderBy(ts)
        prev = F.lag(F.col(ts)).over(w)
        is_new = F.when(
            prev.isNull()
            | ((F.unix_micros(F.col(ts)) - F.unix_micros(prev)) > gap_us),
            F.lit(1),
        ).otherwise(F.lit(0))
        running = Window.partitionBy(key).orderBy(ts).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        return df.withColumn(session_col, F.sum(is_new).over(running))

    if bucket_seconds <= gap_seconds:
        raise ValueError(
            "bucket_seconds must exceed gap_seconds (a session gap may "
            "never span a full bucket, or non-adjacent buckets could "
            "merge)"
        )
    bucket_us = int(bucket_seconds * 1_000_000)
    us = F.unix_micros(F.col(ts))
    ev = df.withColumn("__b__", F.floor(us / F.lit(bucket_us)))
    wl = Window.partitionBy(key, "__b__").orderBy(ts)
    prev = F.lag(F.col(ts)).over(wl)
    local_new = F.when(
        prev.isNull()
        | ((F.unix_micros(F.col(ts)) - F.unix_micros(prev)) > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    wlr = Window.partitionBy(key, "__b__").orderBy(ts).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ev = ev.withColumn("__lsid__", F.sum(local_new).over(wlr))
    summ = ev.groupBy(key, "__b__").agg(
        F.min(us).alias("__first__"),
        F.max(us).alias("__last__"),
        F.max("__lsid__").alias("__nsess__"),
    )
    wb = Window.partitionBy(key).orderBy("__b__")
    prev_last = F.lag("__last__").over(wb)
    summ = summ.withColumn(
        "__merge__",
        F.when(
            prev_last.isNotNull()
            & ((F.col("__first__") - prev_last) <= gap_us),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    woff = Window.partitionBy(key).orderBy("__b__").rowsBetween(
        Window.unboundedPreceding, -1
    )
    summ = summ.select(
        key,
        "__b__",
        "__merge__",
        F.coalesce(
            F.sum(F.col("__nsess__") - F.col("__merge__")).over(woff),
            F.lit(0),
        ).alias("__off__"),
    )
    return (
        ev.join(summ, on=[key, "__b__"])
        .withColumn(
            session_col,
            F.col("__off__") + F.col("__lsid__") - F.col("__merge__"),
        )
        .drop("__b__", "__lsid__", "__off__", "__merge__")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Union[str, Sequence[str]],
    left_ts: str,
    right_ts: Optional[str] = None,
    right_cols: Optional[List[str]] = None,
    suffix: str = "_r",
    tolerance_seconds: Optional[float] = None,
    bucket_seconds: Optional[float] = None,
) -> DataFrame:
    """Left as-of join: attach, to every left row, the payload of the
    most recent right row with the same key and ``right.ts <= left.ts``.

    Matches DuckDB ``ASOF LEFT JOIN`` / pandas ``merge_asof``
    (direction='backward', allow_exact_matches=True) semantics: ties on
    the timestamp DO match, and unmatched left rows survive with null
    payload. ``tolerance_seconds`` additionally nulls matches older
    than the tolerance.

    Implementation: union both sides with a side tag, then one window
    pass taking the last non-null right payload at-or-before each row.
    One shuffle of |L|+|R| rows; no nested-loop join.

    ``bucket_seconds`` (opt-in) is the celebrity-key skew mitigation
    (same idea as :func:`sessionize`): the window partition is salted
    with a coarse time bucket so a hot key's rows spread over tasks;
    rows whose bucket holds no earlier right row take their payload
    from a per-bucket-summary carry (the latest right payload of any
    EARLIER bucket, one tiny window over (key, bucket) summaries).
    Value-identical to the unsalted path (tested).
    """
    keys = [on] if isinstance(on, str) else list(on)
    rts = right_ts or left_ts
    payload = right_cols or [
        c for c in right.columns if c not in set(keys) | {rts}
    ]
    rts_out = (rts if rts not in left.columns else rts + suffix) + "__asof"

    lstruct = F.struct(*[F.col(c) for c in left.columns])
    rstruct = F.struct(
        F.col(rts).alias("__rts__"), *[F.col(c) for c in payload]
    )
    l_type = left.select(lstruct.alias("s")).schema["s"].dataType
    r_type = right.select(rstruct.alias("s")).schema["s"].dataType

    lu = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__ts__"),
        F.lit(1).alias("__side__"),
        lstruct.alias("__l__"),
        F.lit(None).cast(r_type).alias("__r__"),
    )
    ru = right.select(
        *[F.col(k) for k in keys],
        F.col(rts).alias("__ts__"),
        F.lit(0).alias("__side__"),
        F.lit(None).cast(l_type).alias("__l__"),
        rstruct.alias("__r__"),
    )
    # Right rows sort before left rows at equal __ts__ (side 0 < 1), so
    # an exact-tie right row is inside the window of the tied left row.
    u = lu.unionByName(ru)
    if bucket_seconds is None:
        w = (
            Window.partitionBy(*keys)
            .orderBy("__ts__", "__side__")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = u.withColumn(
            "__m__", F.last("__r__", ignorenulls=True).over(w)
        ).filter(F.col("__side__") == 1)
    else:
        if bucket_seconds <= 0:
            raise ValueError("bucket_seconds must be > 0")
        bucket_us = max(int(bucket_seconds * 1_000_000), 1)
        u = u.withColumn(
            "__b__",
            F.floor(F.unix_micros(F.col("__ts__")) / F.lit(bucket_us)),
        )
        wl = (
            Window.partitionBy(*keys, "__b__")
            .orderBy("__ts__", "__side__")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        u = u.withColumn(
            "__ml__", F.last("__r__", ignorenulls=True).over(wl)
        )
        # Per (key, bucket) summary over ALL buckets present (left-only
        # buckets included, so the carry propagates through them), with
        # the bucket's LATEST right payload (null when none). The carry
        # is the last non-null summary payload of any STRICTLY EARLIER
        # bucket — O(#buckets per key) rows, never O(events).
        summ = u.groupBy(*keys, "__b__").agg(
            F.max_by(
                "__r__",
                F.when(F.col("__side__") == 0, F.col("__ts__")),
            ).alias("__lastr__")
        )
        wb = (
            Window.partitionBy(*keys)
            .orderBy("__b__")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        summ = summ.select(
            *keys,
            "__b__",
            F.last("__lastr__", ignorenulls=True)
            .over(wb)
            .alias("__carry__"),
        )
        matched = (
            u.join(summ, on=[*keys, "__b__"])
            .withColumn("__m__", F.coalesce("__ml__", "__carry__"))
            .filter(F.col("__side__") == 1)
        )

    m: Column = F.col("__m__")
    if tolerance_seconds is not None:
        tol_us = int(tolerance_seconds * 1_000_000)
        in_tol = (
            F.unix_micros(F.col("__ts__"))
            - F.unix_micros(m.getField("__rts__"))
        ) <= tol_us
        m = F.when(m.isNotNull() & in_tol, m)

    return matched.select(
        F.col("__l__.*"),
        *[m.getField(c).alias(c + suffix) for c in payload],
        m.getField("__rts__").alias(rts_out),
    )


def time_range_join(
    left: DataFrame,
    right: DataFrame,
    on: Union[str, Sequence[str]],
    left_ts: str,
    right_ts: str,
    lower_seconds: float,
    upper_seconds: float,
    suffix: str = "_r",
) -> DataFrame:
    """Inner join of rows with equal keys and ``right.ts - left.ts`` in
    ``[lower_seconds, upper_seconds]`` (an interval/range join).

    Implementation: quantize time into cells of width ``upper - lower``
    (minimum 1s), explode each left row into the <= 2 cells its window
    can touch, equi-join on (key, cell), and apply the exact range
    predicate. Catalyst plans a plain shuffled hash/sort-merge join
    instead of the BroadcastNestedLoopJoin a raw theta-join would get.
    """
    if upper_seconds < lower_seconds:
        raise ValueError("upper_seconds must be >= lower_seconds")
    keys = [on] if isinstance(on, str) else list(on)
    lo_us = int(lower_seconds * 1_000_000)
    hi_us = int(upper_seconds * 1_000_000)
    cell_us = max(hi_us - lo_us, 1_000_000)

    lus = F.unix_micros(F.col(left_ts))
    rus = F.unix_micros(F.col(right_ts))
    l2 = left.withColumn(
        "__cell__",
        F.explode(
            F.sequence(
                F.floor((lus + F.lit(lo_us)) / F.lit(cell_us)),
                F.floor((lus + F.lit(hi_us)) / F.lit(cell_us)),
            )
        ),
    )
    r2 = right.withColumn("__cell__", F.floor(rus / F.lit(cell_us)))

    overlap = [c for c in right.columns if c in set(left.columns)]
    r2 = r2.select(
        "__cell__",
        *[
            F.col(c).alias(c + suffix) if c in set(overlap) - set(keys) else F.col(c)
            for c in right.columns
        ],
    )
    ren = {c: (c + suffix if c in set(overlap) - set(keys) else c) for c in right.columns}

    cond = [l2[k] == r2[k] for k in keys] + [l2["__cell__"] == r2["__cell__"]]
    j = l2.join(r2, cond, "inner").drop(r2["__cell__"]).drop("__cell__")
    for k in keys:
        j = j.drop(r2[k])
    delta = F.unix_micros(F.col(ren[right_ts])) - F.unix_micros(F.col(left_ts))
    return j.filter((delta >= lo_us) & (delta <= hi_us))


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: Union[str, Sequence[str]],
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    cell_seconds: float = 3600.0,
    suffix: str = "_r",
) -> DataFrame:
    """Inner join of interval rows with equal keys whose
    ``[start, end]`` TIMESTAMP ranges OVERLAP (``l_start <= r_end AND
    r_start <= l_end``, inclusive) — sessions x campaigns, genomics
    ranges, ad exposures x visits.

    Implementation: quantize time into ``cell_seconds`` cells, explode
    EACH side into the cells its interval touches, equi-join on
    (key, cell), and keep a pair only in its CANONICAL cell — the one
    containing ``greatest(l_start, r_start)`` (the overlap's start) —
    so each overlapping pair matches exactly once with NO post-join
    dedup. Catalyst plans a plain shuffled equi-join instead of the
    BroadcastNestedLoopJoin a raw theta-join would get; rows per
    interval = interval_len / cell_seconds + 1, so pick
    ``cell_seconds`` near the typical interval length.
    """
    if cell_seconds <= 0:
        raise ValueError("cell_seconds must be > 0")
    keys = [on] if isinstance(on, str) else list(on)
    cell_us = max(int(cell_seconds * 1_000_000), 1)

    def explode_cells(df: DataFrame, s: str, e: str) -> DataFrame:
        sus, eus = F.unix_micros(F.col(s)), F.unix_micros(F.col(e))
        return df.filter(sus <= eus).withColumn(
            "__cell__",
            F.explode(
                F.sequence(
                    F.floor(sus / F.lit(cell_us)),
                    F.floor(eus / F.lit(cell_us)),
                )
            ),
        )

    l2 = explode_cells(left, left_start, left_end)
    r2 = explode_cells(right, right_start, right_end)
    overlap = set(right.columns) & set(left.columns)
    ren = {
        c: (c + suffix if c in overlap - set(keys) else c)
        for c in right.columns
    }
    r2 = r2.select(
        "__cell__", *[F.col(c).alias(ren[c]) for c in right.columns]
    )
    cond = [l2[k] == r2[k] for k in keys] + [l2["__cell__"] == r2["__cell__"]]
    j = l2.join(r2, cond, "inner")
    for k in keys:
        j = j.drop(r2[k])
    ls = F.unix_micros(F.col(left_start))
    le = F.unix_micros(F.col(left_end))
    rs = F.unix_micros(F.col(ren[right_start]))
    re_ = F.unix_micros(F.col(ren[right_end]))
    canonical = F.floor(F.greatest(ls, rs) / F.lit(cell_us))
    return (
        j.filter((ls <= re_) & (rs <= le))
        .filter(l2["__cell__"] == canonical)
        .drop(r2["__cell__"])
        .drop("__cell__")
    )


def funnel_conversion(
    events: DataFrame,
    user_column: str,
    ts_column: str,
    type_column: str,
    steps,
    within_seconds: float,
) -> DataFrame:
    """Classic funnel analysis: for each user, walk ``steps`` (event
    types) in order — each step must occur strictly AFTER the previous
    completed step and within ``within_seconds`` of the FIRST step.
    Returns one row per user with ``steps_completed`` (0..len(steps))
    and ``t0_us`` (the anchoring first-step time in epoch microseconds;
    null when step 1 never happened). The anchor is the user's EARLIEST
    step-1 event.

    Plan shape: ONE groupBy(user) aggregation collecting a per-step
    timestamp array (events of other types never enter the arrays),
    then the strictly-sequential walk as nested JVM array expressions:
    ``cur_k = array_min(filter(arr_k, t -> t > cur_{k-1} AND t <=
    t0 + within))``. A broken chain propagates NULL through every
    later comparison, so ``steps_completed`` is simply 1 + the count
    of non-null cursors. One shuffle total, no Python in the plan.
    This replaced a groupBy().applyInPandas kernel: the kernel's cost
    was dominated by per-GROUP overhead (one Arrow slice + one pandas
    frame per user — at 10M users that overhead, not the event scan,
    was the bill; measured 326 s at sf100 = 1.5x over linear, r10
    decade campaign), while per-user arrays aggregate partially
    map-side and the walk is scalar JVM work.

    ``ts_column`` must be a TIMESTAMP column (compared at microsecond
    precision). The user column may be any type — it is preserved by
    the aggregation.
    """
    from pyspark.sql import types as T

    steps = list(steps)
    if len(steps) < 2:
        raise ValueError("need at least two funnel steps")
    if not isinstance(events.schema[ts_column].dataType, T.TimestampType):
        raise TypeError(
            f"funnel_conversion: {ts_column} must be TIMESTAMP, got "
            f"{events.schema[ts_column].dataType.simpleString()}"
        )
    within_us = int(within_seconds * 1_000_000)

    arrs = (
        events.select(
            F.col(user_column),
            F.unix_micros(F.col(ts_column)).alias("__us__"),
            F.col(type_column).alias("__et__"),
        )
        .groupBy(user_column)
        .agg(
            *[
                F.collect_list(
                    F.when(F.col("__et__") == F.lit(s), F.col("__us__"))
                ).alias(f"__s{k}__")
                for k, s in enumerate(steps)
            ]
        )
    )

    t0 = F.array_min(F.col("__s0__"))
    limit = t0 + F.lit(within_us)

    def _advance(arr: str, prev):
        # Closure factory: F.filter inspects the lambda's arity, so the
        # captured prev/limit must not appear as parameters.
        return F.array_min(
            F.filter(F.col(arr), lambda t: (t > prev) & (t <= limit))
        )

    cursors = [t0]
    for k in range(1, len(steps)):
        cursors.append(_advance(f"__s{k}__", cursors[-1]))
    completed = F.when(t0.isNull(), F.lit(0)).otherwise(
        F.lit(1)
        + sum(c.isNotNull().cast("int") for c in cursors[1:])
    )
    return arrs.select(
        F.col(user_column),
        completed.cast("int").alias("steps_completed"),
        t0.cast("long").alias("t0_us"),
    )


def retention_cohorts(
    events: DataFrame,
    user_column: str,
    ts_column: str,
    period_seconds: int = 7 * 86400,
) -> DataFrame:
    """Retention-cohort table: each user's cohort is the period of
    their FIRST event; for every (cohort, period_offset) the number of
    distinct cohort users active in that period. Pure Catalyst — two
    aggregations (first-seen per user; distinct users per cell) and a
    broadcast-friendly join, no Python.
    """
    if period_seconds <= 0:
        raise ValueError("period_seconds must be > 0")
    per = F.lit(int(period_seconds) * 1_000_000)
    ev = events.select(
        F.col(user_column).alias("__u__"),
        F.floor(F.unix_micros(F.col(ts_column)) / per).alias("__p__"),
    )
    first = ev.groupBy("__u__").agg(F.min("__p__").alias("__cohort__"))
    return (
        ev.join(first, "__u__")
        .groupBy(
            F.col("__cohort__").alias("cohort_period"),
            (F.col("__p__") - F.col("__cohort__")).alias("period_offset"),
        )
        .agg(F.countDistinct("__u__").alias("n_active_users"))
    )
