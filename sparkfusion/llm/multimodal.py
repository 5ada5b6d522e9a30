"""Multimodal columns: image/audio/video as opaque ``binary`` + typed metadata.

The Spark-side plumbing is real and tested — schema contract, Arrow batch
shape, ``mapInPandas`` partition flow, partitioning notes — while the actual
codec calls are stubbed (image/audio libraries are not in this container):
``decode_stub=True`` produces a deterministic md5-derived fake so pipelines
are testable end-to-end; ``decode_stub=False`` raises ``NotImplementedError``
at the exact point a real decoder (PIL/ffmpeg) would plug in.

Scale notes: binary payloads ride the normal columnar path (parquet binary
columns with metadata pushdown on the typed fields); decode is a map-only
``mapInPandas`` pass — no shuffle, Python workers fed Arrow batches. Keep
``spark.sql.files.maxPartitionBytes`` modest (128 MB default) so a partition
of large blobs fits executor memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: metadata struct carried alongside every binary payload
MEDIA_META_SCHEMA = StructType(
    [
        StructField("format", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("source_id", LongType(), False),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("content", BinaryType(), True),
        StructField("meta", MEDIA_META_SCHEMA, True),
    ]
)

#: decode output: per-item image-like features
DECODE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("phash", StringType(), True),
    ]
)


def to_media_table(df: DataFrame, id_col: str, payload_col: str, fmt: str = "txt") -> DataFrame:
    """Wrap an arbitrary column as an opaque media table: binary ``content``
    + typed ``meta`` struct (format, n_bytes, source_id)."""
    content = F.encode(F.col(payload_col).cast("string"), "UTF-8")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        content.alias("content"),
        F.struct(
            F.lit(fmt).alias("format"),
            F.length(content).cast("long").alias("n_bytes"),
            F.col(id_col).cast("long").alias("source_id"),
        ).alias("meta"),
    )


def _fake_decode(content: bytes) -> tuple[int, int, int, str]:
    """Deterministic stand-in for a real image decode: md5-derived dims.
    Replicable by the oracle as md5 of the same payload."""
    digest = hashlib.md5(content).hexdigest()
    width = int(digest[:4], 16) % 1920 + 1
    height = int(digest[4:8], 16) % 1080 + 1
    return width, height, 3, digest


def decode_media(df: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode/feature-extract pass over a media table via ``mapInPandas``.

    Arrow-batched: each partition arrives as an iterator of pandas
    DataFrames; output schema is :data:`DECODE_SCHEMA`. With
    ``decode_stub=False`` this is where PIL/libav decode would run — it
    raises ``NotImplementedError`` (codec libs absent in this container).
    """

    def decode_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg — not in this container"
                )
            feats = [_fake_decode(bytes(c)) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "channels": [f[2] for f in feats],
                    "phash": [f[3] for f in feats],
                }
            )

    return df.select("media_id", "content").mapInPandas(decode_partition, DECODE_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 10, decode_stub: bool = True) -> DataFrame:
    """Video frame-sampling plumbing: emits one row per sampled "frame" with
    a frame index — the fan-out shape (1 row in → N rows out) a real
    ffmpeg-based sampler produces. Frame count is derived deterministically
    from the payload in stub mode."""

    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_idx", IntegerType(), False),
            StructField("frame_hash", StringType(), True),
        ]
    )

    def sample_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError("real frame sampling requires ffmpeg")
            rows: dict[str, list] = {"media_id": [], "frame_idx": [], "frame_hash": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                digest = hashlib.md5(bytes(content)).hexdigest()
                n_frames = int(digest[8:10], 16) % 64 + 1
                for idx in range(0, n_frames, every_n):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(idx)
                    rows["frame_hash"].append(
                        hashlib.md5(f"{digest}:{idx}".encode()).hexdigest()
                    )
            yield pd.DataFrame(rows)

    return df.select("media_id", "content").mapInPandas(sample_partition, out_schema)
