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
        if state.hasTimedOut:
            start_us, end_us, n, v = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(end_us, unit="us")],
                    "n_events": [n],
                    "total_value": [v],
                }
            )
            return
        start_us = end_us = None
        n, v = 0, 0.0
        if state.exists:
            start_us, end_us, n, v = state.get
        for pdf in pdfs:
            ts = (pdf["event_time"].astype("int64") // 1000).to_numpy()
            if len(ts) == 0:
                continue
            lo, hi = int(ts.min()), int(ts.max())
            start_us = lo if start_us is None else min(start_us, lo)
            end_us = hi if end_us is None else max(end_us, hi)
            n += int(len(ts))
            v += float(pdf["value"].fillna(0.0).sum())
        if start_us is not None:
            state.update((start_us, end_us, n, v))
            state.setTimeoutTimestamp(end_us // 1000 + gap_us // 1000)
        yield pd.DataFrame(
            columns=[
                "user_id",
                "session_start",
                "session_end",
                "n_events",
                "total_value",
            ]
        )

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
