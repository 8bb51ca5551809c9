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


def test_document_ingest_stream_matches_batch(spark, tmp_path):
    """The document pipeline (quality -> fingerprint dedup -> token
    stats) runs unchanged on Structured Streaming; availableNow replay
    must keep exactly the batch pipeline's documents (same fingerprint
    set; one doc per fingerprint)."""
    import shutil

    from tumult_analytics_spark.streaming import (
        document_ingest_pipeline,
        read_document_stream,
    )

    docs_file = os.path.join(SF_DIR, "documents.parquet")
    batch_docs = spark.read.parquet(docs_file)
    batch_out = document_ingest_pipeline(batch_docs)
    batch_fps = {r["fingerprint"] for r in batch_out.collect()}
    assert batch_out.count() == len(batch_fps)  # one row per fingerprint

    stage = tmp_path / "docs_dir"
    stage.mkdir()
    shutil.copy(docs_file, stage / "part-0.parquet")
    stream = read_document_stream(spark, str(stage))
    out = document_ingest_pipeline(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("doc_ingest")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM doc_ingest").collect()
    assert {r["fingerprint"] for r in rows} == batch_fps
    assert len(rows) == len(batch_fps)


def test_streaming_dedup_exact_batch_degradation(spark):
    import pandas as pd

    from tumult_analytics_spark.streaming import streaming_dedup_exact

    df = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1, 2, 3, 3, 3], "v": range(6)})
    )
    out = streaming_dedup_exact(df, ["k"])
    assert out.select("k").distinct().count() == out.count() == 3


def test_streaming_index_dedup_extends_across_batches(spark, tmp_path):
    import os

    from tumult_analytics_spark.operators import dedup as D
    from tumult_analytics_spark.streaming import make_index_dedup_batch_fn

    base = "the quick brown fox jumps over the lazy dog " * 6
    novel = "fresh new material never seen before anywhere " * 5
    corpus = spark.createDataFrame(
        [(1, base), (2, "unrelated corpus text about physical plans " * 5)],
        "doc_id long, text string",
    )
    idx = D.build_minhash_index(corpus, "text", "doc_id")

    # batch0: a near-dup of corpus doc 1 (dropped) + a novel doc (kept).
    # batch1: a near-dup of the NOVEL doc — only dropped if the index
    # was extended after batch0 — plus another new doc.
    stage = tmp_path / "batches"
    stage.mkdir()
    batches = [
        [(10, base.replace("lazy", "idle")), (11, novel)],
        [(20, novel), (21, "genuinely new content about bit readers " * 5)],
    ]
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        p = str(tmp_path / f"b{i}")
        df.coalesce(1).write.parquet(p)
        part = [f for f in os.listdir(p) if f.endswith(".parquet")][0]
        dst = str(stage / f"batch-{i}.parquet")
        os.rename(os.path.join(p, part), dst)
        os.utime(dst, (1_700_000_000 + i * 1000,) * 2)

    kept_ids = []

    def write_kept(kept, batch_id):
        kept_ids.append((batch_id, sorted(r["doc_id"] for r in kept.collect())))

    fn = make_index_dedup_batch_fn(idx, write_kept, 0.7)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stage))
    )
    q = (
        stream.writeStream.foreachBatch(fn)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert kept_ids == [(0, [11]), (1, [21])]
    # The extended index is exposed on the batch fn.
    assert fn.state["index"].kind == "minhash"


class TestStreamStaticEnrichment:
    def test_stream_matches_batch(self, spark, tmp_path):
        import uuid

        from tumult_analytics_spark.streaming import (
            enriched_segment_rollup,
            read_event_stream,
        )

        sf = "/root/testdata/sf0.001"
        stage = tmp_path / "events"
        stage.mkdir()
        import shutil

        shutil.copy(f"{sf}/events.parquet", stage / "part-000.parquet")
        customer = spark.read.parquet(f"{sf}/customer.parquet")

        stream = read_event_stream(spark, str(stage))
        name = f"t_enrich_{uuid.uuid4().hex[:8]}"
        q = (
            enriched_segment_rollup(stream, customer)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r["c_mktsegment"], r["event_type"]): (r["n"], r["sum_value"])
            for r in spark.table(name).collect()
        }
        batch = spark.read.parquet(f"{sf}/events.parquet")
        want = {
            (r["c_mktsegment"], r["event_type"]): (r["n"], r["sum_value"])
            for r in enriched_segment_rollup(batch, customer).collect()
        }
        assert got == want and len(got) > 0

    def test_join_is_broadcast(self, spark):
        from tumult_analytics_spark.streaming import enrich_with_dimension

        sf = "/root/testdata/sf0.001"
        events = spark.read.parquet(f"{sf}/events.parquet")
        customer = spark.read.parquet(f"{sf}/customer.parquet")
        plan = (
            enrich_with_dimension(events, customer, "user_id", "c_custkey")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan


class TestSessionizeGapSplit:
    def test_replayed_history_matches_batch_windows(self, spark, tmp_path):
        import random
        import uuid

        from pyspark.sql import functions as F

        from tumult_analytics_spark.streaming.sessionize import (
            sessionize_events,
        )

        rng = random.Random(17)
        base = 1_700_000_000_000_000  # us
        rows = []
        for user in range(6):
            t = base + rng.randrange(0, 10**9)
            for _ in range(rng.randrange(5, 40)):
                # mixture of small steps and > gap jumps
                t += rng.choice(
                    [rng.randrange(1, 10**6), rng.randrange(2, 5) * 10**9]
                )
                rows.append((user, t, rng.random()))
        df = spark.createDataFrame(
            [(u, t, v) for u, t, v in rows], "user_id long, us long, value double"
        ).select(
            "user_id",
            F.timestamp_micros(F.col("us")).alias("event_time"),
            "value",
        )
        # batch truth: gap-split with the window formulation (30 min)
        from pyspark.sql import Window

        w = Window.partitionBy("user_id").orderBy("event_time")
        gap_us = 30 * 60 * 1_000_000
        marked = df.withColumn(
            "new",
            (
                F.coalesce(
                    F.unix_micros("event_time")
                    - F.unix_micros(F.lag("event_time").over(w)),
                    F.lit(gap_us + 1),
                )
                > gap_us
            ).cast("long"),
        ).withColumn("sid", F.sum("new").over(w))
        want = sorted(
            (
                r["user_id"],
                r["start"],
                r["end"],
                r["n"],
            )
            for r in marked.groupBy("user_id", "sid")
            .agg(
                F.min(F.unix_micros("event_time")).alias("start"),
                F.max(F.unix_micros("event_time")).alias("end"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        # stream replay: the full history in one micro-batch + sentinel
        import shutil

        stage = tmp_path / "ev"
        stage.mkdir()
        sentinel = spark.createDataFrame(
            [(999, base + 10**12, 0.0)], "user_id long, us long, value double"
        ).select(
            "user_id",
            F.timestamp_micros(F.col("us")).alias("event_time"),
            "value",
        )
        for i, part in enumerate([df, sentinel]):
            p = tmp_path / f"b{i}"
            part.coalesce(1).write.parquet(str(p))
            f = [x for x in p.iterdir() if x.name.endswith(".parquet")][0]
            dst = stage / f"batch-{i}.parquet"
            shutil.move(str(f), str(dst))
            import os as _os

            _os.utime(dst, (1_700_000_000 + i * 1000,) * 2)
        stream = (
            spark.readStream.schema(
                "user_id long, event_time timestamp, value double"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(str(stage))
        )
        name = f"sess_prop_{uuid.uuid4().hex[:8]}"
        q = (
            sessionize_events(stream, gap="30 minutes")
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = sorted(
            (
                r["user_id"],
                int(r["session_start"].timestamp() * 1_000_000),
                int(r["session_end"].timestamp() * 1_000_000),
                r["n_events"],
            )
            for r in spark.table(name).collect()
            if r["user_id"] != 999
        )
        assert got == want


def test_checkpoint_recovery_processes_only_new_files(spark, tmp_path):
    """Exactly-once resume: a second run against the SAME checkpoint
    must process only files added after the first run — the restart
    semantics a crashed/cron-resumed ingest job depends on."""
    import shutil

    from pyspark.sql import functions as F

    stage = tmp_path / "in"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    stage.mkdir()

    ev = _read_batch(spark).limit(200).withColumn(
        "batch_tag", F.lit("first")
    )
    ev.coalesce(1).write.parquet(str(tmp_path / "b1"))
    part = [
        f for f in (tmp_path / "b1").iterdir() if f.name.endswith(".parquet")
    ][0]
    shutil.copy(part, stage / "batch-1.parquet")

    def run_once():
        stream = (
            spark.readStream.schema(ev.schema).parquet(str(stage))
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    first = spark.read.parquet(str(out)).count()
    assert first == 200

    # Add a second file and resume from the same checkpoint.
    ev2 = _read_batch(spark).limit(350).withColumn(
        "batch_tag", F.lit("second")
    )
    ev2.coalesce(1).write.parquet(str(tmp_path / "b2"))
    part2 = [
        f for f in (tmp_path / "b2").iterdir() if f.name.endswith(".parquet")
    ][0]
    shutil.copy(part2, stage / "batch-2.parquet")

    run_once()
    result = spark.read.parquet(str(out))
    # batch-1 rows were NOT reprocessed: exactly 200 + 350 rows, with
    # the first batch appearing exactly once.
    assert result.count() == 550
    tags = {
        r["batch_tag"]: r["n"]
        for r in result.groupBy("batch_tag").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert tags == {"first": 200, "second": 350}


class TestStreamStreamIntervalJoin:
    """stream_time_range_join (r4 verdict #9): a watermarked two-stream
    interval join, value-matched against the batch time_range_join
    operator on the same data — including matches that span
    micro-batches (one file per trigger)."""

    def _mk(self, spark, rows):
        import datetime as dt

        t0 = dt.datetime(2024, 3, 1)
        return spark.createDataFrame(
            [
                (i, u, t0 + dt.timedelta(seconds=s), v)
                for (i, u, s, v) in rows
            ],
            "event_id long, user_id long, event_time timestamp, value double",
        )

    def test_two_stream_run_matches_batch_operator(self, spark, tmp_path):
        import shutil

        from pyspark.sql import functions as F

        from tumult_analytics_spark.operators.temporal import (
            time_range_join,
        )
        from tumult_analytics_spark.streaming.joins import (
            stream_time_range_join,
        )

        # left: impressions; right: responses. Include a cross-batch
        # pair (left event at t=580 in file 0, right at t=1100 in
        # file 1 -> delta 520s, must match out of join state), an
        # exact-boundary pair (delta == 600), and a non-match (601).
        left_rows = [
            (1, 10, 0.0, 1.0),
            (2, 10, 580.0, 1.0),
            (3, 11, 100.0, 1.0),
            (4, 12, 50.0, 1.0),
        ]
        right_rows = [
            (101, 10, 300.0, 2.0),   # matches 1 (300) — same batch
            (102, 10, 1100.0, 2.0),  # matches 2 (520) — cross batch
            (103, 11, 700.0, 2.0),   # matches 3 (600) — boundary
            (104, 12, 651.0, 2.0),   # 601s after 4 — no match
            (105, 99, 10.0, 2.0),    # no left for this user
        ]
        lb = self._mk(spark, left_rows)
        rb = self._mk(spark, right_rows)
        expected = {
            (r.event_id, r.event_id_r)
            for r in time_range_join(
                lb, rb, "user_id", "event_time", "event_time", 0.0, 600.0
            ).collect()
        }
        assert expected == {(1, 101), (2, 102), (3, 103)}

        # stage each side as two time-ordered files -> two micro-batches
        for side, df, cut in (("l", lb, 500.0), ("r", rb, 500.0)):
            d = tmp_path / side
            d.mkdir()
            import datetime as dt

            t0 = dt.datetime(2024, 3, 1)
            early = df.filter(
                F.col("event_time") < t0 + dt.timedelta(seconds=cut)
            )
            late = df.filter(
                F.col("event_time") >= t0 + dt.timedelta(seconds=cut)
            )
            for i, part in enumerate((early, late)):
                pdir = tmp_path / f"{side}_stage{i}"
                part.coalesce(1).write.parquet(str(pdir))
                pf = [
                    f
                    for f in pdir.iterdir()
                    if f.name.endswith(".parquet")
                ][0]
                shutil.copy(pf, d / f"p{i}.parquet")

        schema = "event_id long, user_id long, event_time timestamp, value double"

        def read_side(side):
            return (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(str(tmp_path / side))
            )

        joined = stream_time_range_join(
            read_side("l"),
            read_side("r"),
            "user_id",
            "event_time",
            "event_time",
            0.0,
            600.0,
            watermark="10 minutes",
        )
        assert joined.isStreaming
        q = (
            joined.writeStream.format("memory")
            .queryName("tas_test_ssij")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        got = {
            (r.event_id, r.event_id_r)
            for r in spark.table("tas_test_ssij").collect()
        }
        assert got == expected

    def test_validation(self, spark):
        from tumult_analytics_spark.streaming.joins import (
            stream_time_range_join,
        )

        df = self._mk(spark, [(1, 1, 0.0, 1.0)])
        with pytest.raises(ValueError, match="upper_seconds"):
            stream_time_range_join(
                df, df, "user_id", "event_time", "event_time", 5.0, 1.0
            )
        with pytest.raises(ValueError, match="missing"):
            stream_time_range_join(
                df, df, "nope", "event_time", "event_time", 0.0, 1.0
            )

    def test_batch_input_same_semantics(self, spark):
        from tumult_analytics_spark.streaming.joins import (
            stream_time_range_join,
        )

        lb = self._mk(spark, [(1, 10, 0.0, 1.0)])
        rb = self._mk(spark, [(101, 10, 300.0, 2.0), (102, 10, 700.0, 2.0)])
        out = stream_time_range_join(
            lb, rb, "user_id", "event_time", "event_time", 0.0, 600.0
        )
        rows = out.collect()
        assert [(r.event_id, r.event_id_r) for r in rows] == [(1, 101)]
        # suffix disambiguation mirrors the batch operator
        assert "event_time_r" in out.columns
        assert "value_r" in out.columns
