"""Multimodal column support: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

Design (SURVEY.md §7 M6): the 100 TB-scale pattern for multimodal training
data is (a) payloads live in a `binary` column (or object-store URIs),
(b) per-modality metadata is a typed struct, (c) all decode/transform
stages are `mapInPandas` generators so payloads stream through Arrow in
bounded batches and never materialize a full partition in Python memory.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so
`_decode_bytes` is a clearly-marked deterministic stub: it derives fake
"decoded" features from the payload bytes (md5-seeded), keeping every
Spark-side contract — schema, batch shape, null handling, partitioning —
real and testable.  Swap `_decode_bytes` for a real codec in production.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MULTIMODAL_SCHEMA = StructType(
    [
        StructField("item_id", LongType(), False),
        StructField("modality", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("uri", StringType(), True),  # object-store pointer alt.
        StructField("media_type", StringType(), True),  # mime
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("item_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("byte_len", LongType(), True),
        StructField("feature", ArrayType(DoubleType()), True),
    ]
)


def _decode_bytes(payload: bytes | None, dim: int = 8) -> list[float] | None:
    """STUB codec: deterministic pseudo-features from payload bytes.

    Real deployment replaces this with PIL.Image.open / torchaudio.load /
    av frame decode.  Raises nothing here so the pipeline shape is
    exercised; a production build may instead raise NotImplementedError
    when the codec import fails.
    """
    if payload is None:
        return None
    h = hashlib.md5(payload).digest()
    return [b / 255.0 for b in h[:dim]]


def attach_payload_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """JVM-side metadata that needs no codec: byte length + content hash
    (dedup key for exact multimodal dedup)."""
    return df.withColumn(
        "byte_len", F.length(F.col(payload_col)).cast("long")
    ).withColumn("content_md5", F.md5(F.col(payload_col)))


def decode_images(df: DataFrame, batch_size: int = 256, dim: int = 8) -> DataFrame:
    """Decode/feature-extract stage as mapInPandas (Arrow batches).

    At scale: runs fully parallel per input partition, no shuffle; bound
    memory by `spark.sql.execution.arrow.maxRecordsPerBatch`.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start : start + batch_size]
                yield pd.DataFrame(
                    {
                        "item_id": chunk["item_id"],
                        "modality": chunk["modality"],
                        "byte_len": [
                            len(p) if p is not None else None
                            for p in chunk["payload"]
                        ],
                        "feature": [
                            _decode_bytes(p, dim) for p in chunk["payload"]
                        ],
                    }
                )

    return df.mapInPandas(gen, schema=DECODED_SCHEMA)


def resize_images(
    df: DataFrame, width: int = 224, height: int = 224, batch_size: int = 256
) -> DataFrame:
    """Resize stage (stub codec): emits the original payload metadata plus
    the target geometry and a deterministic fake resized payload (md5 of
    payload + geometry — a real build calls PIL .resize and re-encodes).
    Pure map-side: partitioning and batch shape identical to production."""
    schema = StructType(
        [
            StructField("item_id", LongType(), False),
            StructField("width", IntegerType(), True),
            StructField("height", IntegerType(), True),
            StructField("resized_payload", BinaryType(), True),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        geo = f"{width}x{height}".encode()
        for pdf in batches:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start : start + batch_size]
                yield pd.DataFrame(
                    {
                        "item_id": chunk["item_id"],
                        "width": width,
                        "height": height,
                        "resized_payload": [
                            hashlib.md5(p + geo).digest() if p is not None else None
                            for p in chunk["payload"]
                        ],
                    }
                )

    return df.filter(F.col("modality") == "image").mapInPandas(gen, schema=schema)


def extract_audio_features(df: DataFrame, dim: int = 8) -> DataFrame:
    """Audio path shares the decode plumbing (stub codec, real schema)."""
    return decode_images(df.filter(F.col("modality") == "audio"), dim=dim)


def sample_video_frames(
    df: DataFrame, every_ms: int = 1000, max_frames: int = 8
) -> DataFrame:
    """Frame-sampling stage: one output row per sampled frame.

    The stub derives frame offsets from duration_ms; a real build decodes
    keyframes.  Shape matters: this is a generator flatMap (1→N rows)
    inside mapInPandas, the scale-safe way to explode media into frames.
    """
    schema = StructType(
        [
            StructField("item_id", LongType(), False),
            StructField("frame_no", IntegerType(), False),
            StructField("offset_ms", LongType(), False),
            StructField("feature", ArrayType(DoubleType()), True),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"item_id": [], "frame_no": [], "offset_ms": [], "feature": []}
            for _, r in pdf.iterrows():
                # nullable LongType arrives as float64 with NaN for NULL
                # (and NaN is truthy) — guard both, default to 1 frame
                dur = r["duration_ms"]
                dur = 0 if dur is None or dur != dur else dur
                n = min(max_frames, max(1, int(dur // every_ms)))
                for i in range(n):
                    rows["item_id"].append(r["item_id"])
                    rows["frame_no"].append(i)
                    rows["offset_ms"].append(i * every_ms)
                    seed = (
                        r["payload"] + i.to_bytes(4, "little")
                        if r["payload"] is not None
                        else None
                    )
                    rows["feature"].append(_decode_bytes(seed))
            yield pd.DataFrame(rows)

    return df.filter(F.col("modality") == "video").mapInPandas(gen, schema=schema)
