"""Streaming training-data ingest over the documents table.

The text operators (quality score, token counts, fingerprinting,
language id) are pure Catalyst expressions, so the SAME functions run
unchanged on a streaming DataFrame — Catalyst compiles them into the
incremental plan. This module adds the stream-specific pieces:

- watermark-bounded exact dedup (``dropDuplicatesWithinWatermark``):
  state holds one key per document fingerprint inside the watermark
  horizon, the standard way to dedup an unbounded ingest feed without
  unbounded state;
- the composed ingest pipeline (quality filter -> fingerprint dedup ->
  token stats) used as the streaming counterpart of
  ``operators.entry.q_pipeline_compose``.

Batch/stream parity is the test strategy, as in ``streaming/events.py``:
run the same plan in batch, assert exact values, then replay the same
files under ``trigger(availableNow=True)`` and compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: documents table schema as stored.
DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)


def read_document_stream(spark: SparkSession, path: str) -> DataFrame:
    """readStream over a parquet directory of documents (file source —
    the replay/backfill pattern; swap for Kafka/Kinesis in production)."""
    return (
        spark.readStream.schema(DOCUMENT_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(path)
    )


def streaming_dedup_exact(
    stream: DataFrame,
    key_columns,
    event_time_column: str = "ingest_time",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first arrival per key within the watermark horizon.

    State is one entry per distinct key still inside the watermark —
    O(#distinct keys per horizon), never O(rows). On a batch DataFrame
    this degrades to plain ``dropDuplicates`` over the keys (parity path
    for tests)."""
    keys = list(key_columns)
    if not stream.isStreaming:
        return stream.dropDuplicates(keys)
    df = stream
    if event_time_column not in df.columns:
        df = df.withColumn(event_time_column, F.current_timestamp())
    return df.withWatermark(event_time_column, watermark).dropDuplicatesWithinWatermark(
        keys
    )


def make_index_dedup_batch_fn(
    index,
    write_kept,
    min_signature_similarity: float = 0.5,
    extend_index: bool = True,
):
    """Incremental near-dup dedup of a document stream against a
    persisted MinHash index, as a ``foreachBatch`` function.

    Near-dup dedup needs an anti-join plus per-document aggregation over
    the band join — shapes Structured Streaming cannot run natively
    (stream-stream anti joins are unsupported). ``foreachBatch`` is the
    idiomatic Spark answer: each micro-batch is an ordinary DataFrame,
    so the full batch operator (:func:`~..operators.dedup
    .dedup_against_index`) runs unchanged, and between batches the
    index is EXTENDED with the kept rows — so a document that survives
    batch k dedups its near-duplicates in batch k+1.

    ``write_kept(kept_df, batch_id)`` receives the kept rows (already
    materialized) — write them to your sink idempotently (foreachBatch
    is at-least-once; overwrite-by-batch_id or dedup-on-read).

    State note: the extended index lives in this process for the run.
    On restart, rebuild it with ``build_minhash_index`` over the sink's
    accumulated output plus the original corpus — cheaper than it
    sounds, since signatures are one Arrow pass and the sink holds
    exactly the kept documents.

    Usage::

        fn = make_index_dedup_batch_fn(index, write_kept)
        stream.writeStream.foreachBatch(fn).trigger(availableNow=True)...

    The current (possibly extended) index is readable as ``fn.state
    ["index"]``.
    """
    from ..operators.dedup import (
        banded_batch,
        dedup_against_index,
        extend_minhash_index,
    )

    state = {"index": index}

    def process(batch_df: DataFrame, batch_id: int) -> None:
        # Sign/band the batch ONCE: the query and the extend otherwise
        # each run the signing kernel over the same batch (and the
        # extend re-scans the batch text a third time for its eager
        # materialization). The kept rows' banded rows are a semi-join
        # of this checkpointed frame — identical values, one kernel.
        idc = state["index"].params["id_column"]
        banded = banded_batch(state["index"], batch_df).localCheckpoint(
            eager=True
        )
        kept = dedup_against_index(
            state["index"], batch_df, min_signature_similarity,
            # micro-batches are small by construction; keep the
            # corpus-scale index un-shuffled
            broadcast_batch=True,
            banded_new=banded,
        ).localCheckpoint(eager=True)  # read by the sink AND the extend
        write_kept(kept, batch_id)
        if extend_index:
            kept_banded = banded.join(
                kept.select(F.col(idc).alias("__id__")),
                on="__id__",
                how="leftsemi",
            )
            state["index"] = extend_minhash_index(
                state["index"], kept, banded_new=kept_banded
            )

    process.state = state
    return process


def document_ingest_pipeline(
    df: DataFrame,
    min_quality: float = 0.99,
    watermark: str = "1 hour",
) -> DataFrame:
    """quality filter -> fingerprint dedup -> per-document token counts.

    Works on both batch and streaming inputs (the dedup step is the only
    stream-aware piece). Returns one row per kept document with
    (doc_id, lang, fingerprint, n_tokens)."""
    from ..operators.text import document_fingerprint, quality_score

    scored = quality_score(df, "text")  # adds n_tokens etc. (Catalyst)
    good = scored.filter(F.col("quality") >= min_quality)
    fp = document_fingerprint(good, "text")
    deduped = streaming_dedup_exact(
        fp, ["fingerprint"], watermark=watermark
    )
    return deduped.select("doc_id", "lang", "fingerprint", "n_tokens")
