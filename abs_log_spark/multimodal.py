"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
``media_type`` tag; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so raw bytes never cross the Python boundary row-at-a-time.

THIS CONTAINER HAS NO IMAGE/AUDIO LIBS: the actual decode is STUBBED — a
deterministic fake feature extractor (byte length, md5, synthetic
width/height/frame-count) plus a clearly-marked ``real_decode`` that raises
NotImplementedError. The Spark-side plumbing — schema, Arrow batch shape,
partitioning, UDF signature — is real and tested; swapping in PIL/ffmpeg
is confined to ``_decode_stub``.

Scale note: payload bytes dominate the row size, so the mapInPandas stage
keys its parallelism off ``spark.sql.execution.arrow.maxRecordsPerBatch``
and files should be laid out with payloads in their own column chunk
(parquet does this for free) so metadata-only queries never read them.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("payload_md5", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def real_decode(payload: bytes, media_type: str):
    """Where PIL / torchaudio / ffmpeg would plug in."""
    raise NotImplementedError(
        "media decode libs are not available in this environment; "
        "use the deterministic stub features instead"
    )


def _decode_stub(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake of decode+inspect: dims derived from byte length."""
    n = len(payload)
    return (n % 640 + 16, (n * 7) % 480 + 16, n % 10 + 1)


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Test fixture: treat the UTF-8 bytes of ``text`` as an opaque payload."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "media_type", F.lit("image/fake")
    )


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over (doc_id, payload, media_type)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [_decode_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "payload_md5": [hashlib.md5(p).hexdigest() for p in pdf["payload"]],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "n_frames": [f[2] for f in feats],
                }
            )

    return df.select("doc_id", "payload", "media_type").mapInPandas(
        batches, FEATURE_SCHEMA
    )
