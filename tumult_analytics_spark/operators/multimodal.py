"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The decode kernels themselves are STUBS (the image/audio libraries are not
in this container — they raise NotImplementedError or produce a
deterministic fake), but the Spark-side plumbing is real and tested:
schemas, Arrow batch shapes, mapInPandas signatures, and partition-size
hygiene are exactly what a real decoder plugs into.

At 100 TB the pattern that matters: binary payloads ride in their own
column, metadata-only queries never touch them (Parquet column pruning),
and decode/featurize is mapInPandas over batches sized by
``spark.sql.files.maxPartitionBytes`` — one Python worker per core, Arrow
transfer, no driver involvement.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Metadata schema attached to every binary media column.
MEDIA_METADATA_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField("format", T.StringType(), True),  # png|wav|mp4|...
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("checksum", T.LongType(), True),  # xxhash64 of payload
    ]
)


def attach_media_metadata(
    df: DataFrame, binary_column: str, media_type: str, fmt: str
) -> DataFrame:
    """Add a typed metadata struct computed from the payload (Catalyst
    only: length + xxhash64; the binary column itself is untouched)."""
    return df.withColumn(
        f"{binary_column}_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.length(F.col(binary_column)).cast("long").alias("n_bytes"),
            F.xxhash64(F.col(binary_column)).alias("checksum"),
        ),
    )


def decode_image(df: DataFrame, binary_column: str) -> DataFrame:
    """Decode images to (height, width, channels) + pixel tensor.

    STUB: raises NotImplementedError at execution time — no imaging
    library in this container. The plumbing (schema, mapInPandas batch
    shape) is the real contract a decoder implements.
    """
    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("height", T.IntegerType(), True),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("channels", T.IntegerType(), True),
        ]
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raise NotImplementedError(
                "Image decoding requires an imaging library (e.g. Pillow); "
                "not available in this environment. Plug a decoder into "
                "this mapInPandas kernel."
            )

    return df.mapInPandas(decode, out_schema)


def extract_byte_histogram_features(
    df: DataFrame, binary_column: str, id_column: str, buckets: int = 16
) -> DataFrame:
    """Deterministic fake 'feature extractor': bucketed byte histogram as
    array<float>, normalized. Exercises the exact batch shape / schema /
    Arrow path a real embedding model would use."""
    import numpy as np

    out_schema = T.StructType(
        [
            df.schema[id_column],
            T.StructField("features", T.ArrayType(T.FloatType()), True),
        ]
    )

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                payload = row[binary_column]
                if payload is None:
                    rows.append({id_column: row[id_column], "features": None})
                    continue
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                hist, _ = np.histogram(arr, bins=buckets, range=(0, 256))
                total = max(int(hist.sum()), 1)
                rows.append(
                    {
                        id_column: row[id_column],
                        "features": (hist / total).astype(np.float32).tolist(),
                    }
                )
            yield pd.DataFrame(rows, columns=[id_column, "features"])

    return df.select(id_column, binary_column).mapInPandas(feats, out_schema)


def sample_video_frames(
    df: DataFrame, binary_column: str, every_n_frames: int = 30
) -> DataFrame:
    """Frame-sampling STUB: schema contract for video expansion (one row
    per sampled frame). Raises at execution; plumbing is real."""
    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("frame_index", T.IntegerType(), True),
            T.StructField("frame_png", T.BinaryType(), True),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raise NotImplementedError(
                "Video frame sampling requires a codec library; plug into "
                "this mapInPandas kernel."
            )

    return df.mapInPandas(sample, out_schema)
