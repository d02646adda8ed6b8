"""Multimodal column plumbing (SURVEY §2.11): image/audio/video as
opaque ``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` stages.

The decode step is STUBBED — image/audio codecs aren't in this
environment — behind ``decode_media`` (raises NotImplementedError) and a
deterministic fake feature extractor used by tests/queries. Everything
Spark-side is real: schema, batch shape, partition sizing, UDF signature.

Scale notes:
- binary payloads dominate row width → ``repartition`` by a size-aware
  key (or rely on maxPartitionBytes) so one Arrow batch stays ≪ 2 GB;
- metadata lives in plain columns so filters (format, dims, duration)
  push down to the parquet scan WITHOUT touching the bytes — column
  pruning means a metadata-only query never reads the blobs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from spacex_data_engineering_pipeline_spark.operators.util import spread

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("content", BinaryType(), True),
        StructField("format", StringType(), True),
        StructField("byte_len", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("byte_len", LongType(), True),
        StructField("content_md5", StringType(), True),
    ]
)


def decode_media(content: bytes, fmt: str):
    """Real decode hook — requires image/audio libs not present here."""
    raise NotImplementedError(
        "media decode requires codec libraries (PIL/ffmpeg) not available "
        "in this environment; use extract_features' deterministic path"
    )


def attach_binary_content(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stand-in media table: UTF-8 bytes of a text column as the opaque
    payload (deterministic, so oracle-checkable end to end).
    """
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.lit("text/plain").alias("format"),
        F.octet_length(F.encode(F.col(text_col), "UTF-8")).alias("byte_len"),
    )


def extract_features(media_df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The deterministic features (byte length, MD5) stand in for real
    decode+embed; the mapInPandas mechanics — batch iteration, schema
    contract, large-binary handling — are exactly what a real extractor
    uses.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_len": content.map(lambda b: len(b) if b is not None else None),
                    "content_md5": content.map(
                        lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                    ),
                }
            )

    return spread(media_df).mapInPandas(_extract, FEATURE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("frame_bytes", BinaryType(), True),
        StructField("frame_md5", StringType(), True),
    ]
)


def sample_frames(media_df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling over opaque media payloads: one input row →
    ``n_frames`` output rows of evenly-spaced byte slices (the
    deterministic stand-in for video frame extraction — a real decoder
    drops into the same mapInPandas contract).

    The 1→N row fan-out is the part built-in exprs can't do with a
    decoder in the loop; Arrow batches keep the payload transfer
    columnar. Output partitioning note: n_frames× row inflation —
    repartition after if frames feed a shuffle-heavy stage.
    """

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_bytes": [], "frame_md5": []}
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                if content is None or len(content) == 0:
                    continue
                step = max(1, len(content) // n_frames)
                for i in range(n_frames):
                    lo = i * step
                    if lo >= len(content):
                        break
                    frame = bytes(content[lo : lo + step])
                    out["media_id"].append(media_id)
                    out["frame_idx"].append(i)
                    out["frame_bytes"].append(frame)
                    out["frame_md5"].append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(out)

    return spread(media_df).mapInPandas(_sample, FRAME_SCHEMA)


def resize_stub(media_df: DataFrame, target_bytes: int = 64) -> DataFrame:
    """'Resize' stand-in: truncate payloads to ``target_bytes`` (a real
    image resize is the same shape: binary in → smaller binary out,
    metadata updated). Native expressions suffice here — no Python
    boundary for a pure byte-level transform.
    """
    return media_df.select(
        "media_id",
        F.expr(f"substring(content, 1, {int(target_bytes)})").alias("content"),
        F.col("format"),
        F.least(F.col("byte_len"), F.lit(int(target_bytes))).alias("byte_len"),
    )
