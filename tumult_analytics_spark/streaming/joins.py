"""Stream-stream time-interval join (Structured Streaming).

The one streaming building block the repo lacked (stream-static
enrichment lives in :mod:`.events`): join TWO live event streams on
equal keys with a bounded event-time offset — ad impressions x clicks,
orders x payments, exposure x conversion.

Unlike the batch path (``operators.temporal.time_range_join``, which
decomposes the theta-join into time-cell equi-joins because a batch
nested-loop join is the alternative), the streaming path uses Spark's
NATIVE stream-stream join operator: with both sides watermarked and
the range expressed as direct event-time comparisons, Catalyst's
StreamingSymmetricHashJoin derives per-side state watermarks from the
condition and EVICTS buffered rows as the watermark passes them —
bounded state, which a hand-rolled cell decomposition cannot tell the
state store about. Semantics (inner join, ``right.ts - left.ts`` in
``[lower, upper]``, suffix disambiguation) match the batch operator
exactly, so the same call value-matches ``time_range_join`` on the
same data — locked by tests/test_streaming.py and the
``streaming_interval_join`` oracle query.
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["stream_time_range_join"]


def stream_time_range_join(
    left: DataFrame,
    right: DataFrame,
    on: Union[str, Sequence[str]],
    left_ts: str,
    right_ts: str,
    lower_seconds: float,
    upper_seconds: float,
    watermark: str = "2 hours",
    suffix: str = "_r",
) -> DataFrame:
    """Inner join of rows with equal keys and ``right.ts - left.ts`` in
    ``[lower_seconds, upper_seconds]`` over two STREAMS (also accepts
    batch frames — same plan minus incremental execution, which is how
    the oracle replays it).

    Output columns mirror the batch ``time_range_join``: all left
    columns, then right columns with ``suffix`` appended where names
    collide (join keys appear once, from the left).

    ``watermark`` bounds lateness on BOTH event-time columns; joined
    with the range condition it bounds the join state: a left row can
    be evicted once the right watermark passes ``left.ts +
    upper_seconds``, and vice versa.
    """
    if upper_seconds < lower_seconds:
        raise ValueError("upper_seconds must be >= lower_seconds")
    keys = [on] if isinstance(on, str) else list(on)
    for k in keys:
        if k not in left.columns or k not in right.columns:
            raise ValueError(f"join key {k!r} missing from a side")

    # Disambiguate by renaming the whole right side before the join —
    # stream-stream joins reject duplicate attribute names in the
    # condition, and the temp prefix keeps key/payload handling uniform.
    r2 = right.select(*[F.col(c).alias(f"__r__{c}") for c in right.columns])
    l2 = left
    if l2.isStreaming:
        l2 = l2.withWatermark(left_ts, watermark)
    if r2.isStreaming:
        r2 = r2.withWatermark(f"__r__{right_ts}", watermark)

    lcol = F.col(left_ts)
    rcol = F.col(f"__r__{right_ts}")
    lo = F.make_dt_interval(secs=F.lit(float(lower_seconds)))
    hi = F.make_dt_interval(secs=F.lit(float(upper_seconds)))
    cond = (rcol >= lcol + lo) & (rcol <= lcol + hi)
    for k in keys:
        cond = cond & (F.col(k) == F.col(f"__r__{k}"))

    j = l2.join(r2, cond, "inner")
    overlap = set(right.columns) & set(left.columns)
    out_cols = [F.col(c) for c in left.columns]
    for c in right.columns:
        if c in keys:
            continue
        name = c + suffix if c in overlap else c
        out_cols.append(F.col(f"__r__{c}").alias(name))
    return j.select(*out_cols)
