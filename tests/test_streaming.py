"""Structured Streaming: batch/stream parity for windowed event rollups."""

import os

import pytest

from tumult_analytics_spark.streaming import (
    dp_windowed_counts,
    read_event_stream,
    windowed_event_counts,
)

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")
EVENTS = os.path.join(SF_DIR, "events.parquet")


def _read_batch(spark):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(EVENTS)


def test_windowed_counts_batch(spark):
    out = windowed_event_counts(_read_batch(spark), window="1 hour")
    rows = out.collect()
    assert len(rows) > 0
    total = sum(r["n"] for r in rows)
    assert total == _read_batch(spark).count()


def test_stream_matches_batch(spark, tmp_path):
    batch = windowed_event_counts(_read_batch(spark), window="1 hour")
    expected = {
        (r["window_start"], r["event_type"]): r["n"] for r in batch.collect()
    }

    # File-source streaming requires a directory; stage the file into one.
    import shutil

    stage = tmp_path / "events_dir"
    stage.mkdir()
    shutil.copy(EVENTS, stage / "part-000.parquet")
    stream = read_event_stream(spark, str(stage))
    assert stream.isStreaming
    windowed = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    q = (
        windowed.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    assert got == expected


def test_dp_windowed_counts_noise_bounded(spark, tmp_path):
    exact = windowed_event_counts(_read_batch(spark), window="1 hour")
    expected = {
        (r["window_start"], r["event_type"]): r["n"] for r in exact.collect()
    }
    noisy = dp_windowed_counts(_read_batch(spark), epsilon=5.0, window="1 hour")
    got = {
        (r["window_start"], r["event_type"]): r["n"] for r in noisy.collect()
    }
    assert set(got) == set(expected)
    for k, v in got.items():
        assert abs(v - expected[k]) <= 10  # eps=5 -> scale 0.2; huge margin
