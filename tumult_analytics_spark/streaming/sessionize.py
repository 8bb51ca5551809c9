"""Custom stateful streaming operator: event sessionization.

The classic applyInPandasWithState pattern: group a stream of events by
user, keep (start, end, count, value-sum) state per user, close a session
when the event-time watermark passes ``gap`` beyond its last event, and
emit one summary row per closed session.

Scale shape: state is O(#active users), each state value is four scalars;
the stream shuffles once on user_id. Late events within the watermark
extend their session; beyond it they are dropped by Spark before the
operator runs.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), True),
        T.StructField("session_start", T.TimestampType(), True),
        T.StructField("session_end", T.TimestampType(), True),
        T.StructField("n_events", T.LongType(), True),
        T.StructField("total_value", T.DoubleType(), True),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType(), True),
        T.StructField("end_us", T.LongType(), True),
        T.StructField("n", T.LongType(), True),
        T.StructField("v", T.DoubleType(), True),
    ]
)


def sessionize_events(stream: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """One row per closed user session (append mode).

    ``stream`` must be a streaming DataFrame with ``user_id``,
    ``event_time`` (timestamp) and ``value`` columns; a watermark of at
    least ``gap`` is applied here.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = _duration_us(gap)

    def fn(
        key: Tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        import numpy as np

        def frame(rows):
            return pd.DataFrame(
                {
                    "user_id": [user_id] * len(rows),
                    "session_start": [
                        pd.Timestamp(r[0], unit="us") for r in rows
                    ],
                    "session_end": [
                        pd.Timestamp(r[1], unit="us") for r in rows
                    ],
                    "n_events": [r[2] for r in rows],
                    "total_value": [r[3] for r in rows],
                }
            )

        if state.hasTimedOut:
            rec = state.get
            state.remove()
            yield frame([rec])
            return
        parts = [p for p in pdfs if len(p)]
        closed = []
        cur = list(state.get) if state.exists else None
        if parts:
            all_ts = np.concatenate(
                [
                    (p["event_time"].astype("int64") // 1000).to_numpy()
                    for p in parts
                ]
            )
            all_v = np.concatenate(
                [p["value"].fillna(0.0).to_numpy(np.float64) for p in parts]
            )
            order = np.argsort(all_ts, kind="stable")
            ts, vs = all_ts[order], all_v[order]
            # split the SORTED batch on intra-batch gaps — a replayed
            # history must produce the same sessions as the batch
            # window formulation, not one mega-session per user
            cut = np.flatnonzero(np.diff(ts) > gap_us) + 1
            bounds = np.concatenate(([0], cut, [len(ts)]))
            for s0, s1 in zip(bounds[:-1], bounds[1:]):
                seg = (
                    int(ts[s0]),
                    int(ts[s1 - 1]),
                    int(s1 - s0),
                    float(vs[s0:s1].sum()),
                )
                if cur is None:
                    cur = list(seg)
                elif seg[0] - cur[1] > gap_us:
                    closed.append(tuple(cur))
                    cur = list(seg)
                else:
                    cur[0] = min(cur[0], seg[0])
                    cur[1] = max(cur[1], seg[1])
                    cur[2] += seg[2]
                    cur[3] += seg[3]
        if cur is not None:
            state.update(tuple(cur))
            state.setTimeoutTimestamp(cur[1] // 1000 + gap_us // 1000)
        yield frame(closed)

    watermarked = stream.withWatermark("event_time", gap)
    return watermarked.groupBy("user_id").applyInPandasWithState(
        fn,
        SESSION_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def _duration_us(s: str) -> int:
    n, unit = s.split()
    mult = {
        "second": 1_000_000,
        "seconds": 1_000_000,
        "minute": 60_000_000,
        "minutes": 60_000_000,
        "hour": 3_600_000_000,
        "hours": 3_600_000_000,
    }[unit]
    return int(n) * mult
